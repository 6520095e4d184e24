package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupConfig, DedupPipeline}
import graft.sources.PagesGen

/** Dev-only: LSH bucket-size distribution + candidate volume at a corpus
  * size. SPARK_GRAFT_NDOCS sets the size.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_NDOCS", "100000").toLong
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    val pages = PagesGen.generate(spark, nDocs, nDomains = 500, seed = 42L)
    val sigs = DedupPipeline.signatures(pages, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = sigs.filter(col("minhash").isNotNull)
      .select(col("uid"), posexplode(graft.functions.Fns.lshBucketsUdf(cfg.bands)(col("minhash"))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val sizes = buckets.groupBy("band", "bucket").count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = sizes.orderBy(col("count").desc).limit(20).collect()
    println(s"[bucketprobe] nDocs=$nDocs topBuckets=" +
      top.map(r => r.getLong(2)).mkString(","))
    val pairMass = sizes.select(sum(col("count") * (col("count") - 1) / 2)).first().get(0)
    println(s"[bucketprobe] total pair mass (pre-gate join output rows) = $pairMass")
    val cappedMass = sizes.filter(col("count") <= 200)
      .select(sum(col("count") * (col("count") - 1) / 2)).first().get(0)
    println(s"[bucketprobe] pair mass under default cap 200 = $cappedMass")
    val hist = sizes.select(
      sum(when(col("count") <= 32, 1).otherwise(0)).as("le32"),
      sum(when(col("count") > 32 && col("count") <= 1000, 1).otherwise(0)).as("le1000"),
      sum(when(col("count") > 1000, 1).otherwise(0)).as("gt1000")).first()
    println(s"[bucketprobe] buckets le32=${hist.get(0)} 33..1000=${hist.get(1)} >1000=${hist.get(2)}")
    spark.stop()
  }
}
