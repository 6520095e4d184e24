package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{DedupConfig, DedupPipeline}
import graft.sources.PagesGen

/** Dev-only probe: dedup throughput at a list of parallelism levels with the
  * exact Bench session settings. Usage:
  *   SPARK_GRAFT_NDOCS=100000 SPARK_GRAFT_LEVELS=8,32 sbt "runMain graft.ScalingProbe"
  */
object ScalingProbe {
  private def build(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCALDIR", System.getProperty("java.io.tmpdir")))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_NDOCS", "100000").toLong
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val cfg = DedupConfig(exactPrecollapse =
      sys.env.getOrElse("SPARK_GRAFT_PRECOLLAPSE", "true").toBoolean)
    levels.foreach { cpus =>
      val spark = build(cpus)
      try {
        val pages = PagesGen.generate(spark, nDocs, nDomains = 500, seed = 42L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pages.count()
        val t0 = System.nanoTime()
        val n = DedupPipeline.run(spark, pages, cfg).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] cpus=$cpus%2d nDocs=$nDocs sec=$sec%8.2f docs_per_sec=${nDocs / sec}%9.1f outRows=$n")
        pages.unpersist()
      } finally spark.stop()
    }
  }
}
