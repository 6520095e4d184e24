package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: does Observation fire on localCheckpoint(eager=true)? */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("probe")
    val df = spark.range(0, 1000).toDF("id")
      .observe(obs, sum(when(col("id") % 2 === 0, 1L).otherwise(0L)).as("evens"))
    val chk = df.localCheckpoint(eager = true)
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val m = try Some(Await.result(obs.future, 5.seconds))
            catch { case _: java.util.concurrent.TimeoutException => None }
    println(s"[obs] after localCheckpoint: $m rows=${chk.count()}")
    spark.stop()
  }
}
