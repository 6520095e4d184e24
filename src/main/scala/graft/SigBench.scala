package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.Fns
import graft.sources.PagesGen

/** Isolates the signatures-stage scaling anomaly: times each sub-part
  * (plain column op, minhash UDF, embed UDF, both, both+persist) at the
  * given parallelism.
  */
object SigBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_NDOCS", "100000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[sig] $cpus cores $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val pages = PagesGen.generate(spark, nDocs, nDomains = 500, seed = 42L)
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("materialize")(pages.count())
    timed("noop_length")(pages.select(sum(length(col("text")))).first())
    val sigUdf = Fns.signaturesUdf(3, 128, 42L)
    timed("minhash_udf")(pages.select(sigUdf(col("text")).as("s"))
      .agg(expr("bit_xor(`s`.simhash)")).first())
    timed("embed_udf")(pages.select(Fns.embedUdf(col("text")).as("v"))
      .agg(avg(element_at(col("v"), 1))).first())
    timed("both")(pages
      .withColumn("s", sigUdf(col("text")))
      .withColumn("v", Fns.embedUdf(col("text")))
      .agg(avg(col("s.simhash") % 1000 + element_at(col("v"), 1))).first())
    val sigs = graft.operators.DedupPipeline.signatures(pages, graft.operators.DedupConfig())
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("full_persist")(sigs.count())
    spark.stop()
  }
}
