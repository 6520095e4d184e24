package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.HashingEmbedder
import graft.operators._
import graft.sources.PagesGen

/** Skew ops, calibration harness, greedy ordering, retention GC. */
class Ops2Spec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("salted aggregation is identical to the direct groupBy") {
    val pages = PagesGen.generate(spark, 800, nDomains = 20, seed = 13L)
      .withColumn("domain", split(col("url"), "/")(2))
    val direct = pages.groupBy(col("domain"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val salted = SkewOps.saltedAggBy(pages, col("domain"), col("url"),
        length(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted.sameElements(direct))
    // skew exists: hottest domain has far more than fair share
    assert(direct.map(_._2).max > 3 * 800 / 20)
  }

  test("capHotBuckets drops only over-df groups") {
    import spark.implicits._
    val df = (Seq.fill(50)("hot") ++ Seq("a", "a", "b")).toDF("k")
    val kept = SkewOps.capHotBuckets(df, Seq(col("k")), 10).collect().map(_.getString(0))
    assert(kept.sorted.sameElements(Array("a", "a", "b")))
  }

  test("calibration grid matches hand-computed metrics and picks best F1") {
    import spark.implicits._
    val pairs = Seq(
      (0.95, 1), (0.92, 1), (0.91, 0), (0.85, 1), (0.70, 0), (0.60, 0))
      .toDF("sim", "label")
    val g = Calibration.grid(spark, pairs, Seq(0.80, 0.90)).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(g(0.80) == ((3L, 1L, 0L))) // tp: .95 .92 .85; fp: .91; fn: none
    assert(g(0.90) == ((2L, 1L, 1L)))
    val best = Calibration.bestThreshold(spark, pairs, Seq(0.80, 0.90))
    // F1(.80)=3/(3+.5*1)=0.857; F1(.90)=2/(2+.5*2)=0.667
    assert(best == 0.80)
  }

  test("calibration on generator truth: recall/precision high at 0.90") {
    val pages = PagesGen.generate(spark, 1500, nDomains = 50, seed = 21L)
    val pairs = Calibration.labeledPairsFromTruth(pages)
    val row = Calibration.grid(spark, pairs, Seq(0.90))
      .select("precision", "recall", "tp", "fp", "fn").first()
    info(s"precision=${row.getDouble(0)} recall=${row.getDouble(1)} " +
      s"tp=${row.getLong(2)} fp=${row.getLong(3)} fn=${row.getLong(4)}")
    assert(row.getLong(2) > 0)
    assert(row.getDouble(0) > 0.95 && row.getDouble(1) > 0.95)
  }

  test("greedy cluster ordering matches a driver-side oracle incl. ties") {
    // oracle: literal port of _order_cluster (article_ordering.py:14-33)
    def oracle(ids: Vector[String], vecs: Map[String, Array[Float]]): Vector[String] = {
      if (ids.length <= 1) return ids
      var remaining = ids.toBuffer
      val start = remaining.maxBy(i =>
        remaining.filter(_ != i).map(j => HashingEmbedder.cosine(vecs(i), vecs(j))).sum)
      val ordered = scala.collection.mutable.ArrayBuffer(start)
      remaining -= start
      while (remaining.nonEmpty) {
        val last = ordered.last
        val nxt = remaining.maxBy(i => HashingEmbedder.cosine(vecs(last), vecs(i)))
        ordered += nxt
        remaining -= nxt
      }
      ordered.toVector
    }
    // scala maxBy keeps the FIRST max like Python max — same tie semantics
    val texts = Vector(
      "alpha beta gamma delta", "alpha beta gamma epsilon", "alpha beta gamma delta",
      "unrelated content entirely", "alpha beta gamma zeta")
    val ids = texts.indices.map(i => s"u$i").toVector
    val vecs = ids.zip(texts.map(HashingEmbedder.embed)).toMap
    val want = oracle(ids, vecs)
    assert(OrderingOps.orderCluster(ids, vecs) == want)

    import spark.implicits._
    val df = ids.zip(texts).zipWithIndex
      .map { case ((id, t), i) => ("c1", id, t, i + 1) }
      .toDF("cluster_id", "url", "text", "rn")
    val got = OrderingOps.greedyOrder(spark, df).collect()
      .sortBy(_.getInt(2)).map(_.getString(1)).toVector
    assert(got == want)
  }

  test("retention GC drops old day partitions and their bookkeeping rows") {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "gc").toString
    val pages = PagesGen.generate(spark, 300, nDomains = 10, nDays = 3, seed = 31L)
    graft.runtime.Checkpoint.runIncremental(spark, pages, root)
    val daysBefore = new java.io.File(s"$root/output").listFiles().map(_.getName).sorted
    assert(daysBefore.length == 3)
    val cutoff = daysBefore(1).stripPrefix("day=")
    val deleted = graft.runtime.Checkpoint.gc(spark, root, cutoff)
    assert(deleted == Seq(daysBefore(0).stripPrefix("day=")))
    val daysAfter = new java.io.File(s"$root/output").listFiles().map(_.getName).sorted
    assert(daysAfter.toSeq == daysBefore.drop(1).toSeq)
    val ckpt = spark.read.parquet(s"$root/checkpoints")
    assert(ckpt.filter(col("day") < cutoff).count() == 0)
    assert(ckpt.count() == 2)
    // and a rerun re-processes only the GC'd day
    val redone = graft.runtime.Checkpoint.runIncremental(spark, pages, root)
    assert(redone == deleted)
  }
}
