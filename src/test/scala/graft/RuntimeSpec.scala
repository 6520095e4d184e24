package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DedupConfig, Multimodal}
import graft.runtime.Checkpoint
import graft.sources.PagesGen

/** Checkpoint/resume (kill-and-rerun fixture, FIXTURES.md §5) and
  * multimodal plumbing.
  */
class RuntimeSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ckpt").toString
    d
  }

  test("kill/rerun resumes from checkpoint; outputs identical to clean run") {
    val pages = PagesGen.generate(spark, 600, nDomains = 30, nDays = 3, seed = 5L)
    val cfg = DedupConfig()

    // clean uninterrupted run
    val cleanRoot = freshRoot()
    val cleanDays = Checkpoint.runIncremental(spark, pages, cleanRoot, cfg)
    assert(cleanDays.size == 3)

    // interrupted run: crash after 1 partition
    val root = freshRoot()
    val ex = intercept[RuntimeException] {
      Checkpoint.runIncremental(spark, pages, root, cfg, failAfter = 1)
    }
    assert(ex.getMessage.contains("injected failure"))
    val doneAfterCrash = Checkpoint.completedDays(spark, root, Checkpoint.configHash(cfg))
    assert(doneAfterCrash.size == 1)

    // resume: must process exactly the remaining 2 days
    val resumed = Checkpoint.runIncremental(spark, pages, root, cfg)
    assert(resumed.size == 2)
    assert(!resumed.contains(doneAfterCrash.head), "resume re-processed a done partition")

    // third run: nothing to do (idempotent)
    assert(Checkpoint.runIncremental(spark, pages, root, cfg).isEmpty)

    // outputs identical to the clean run
    val a = spark.read.parquet(s"$cleanRoot/output").select("url", "cluster_id", "is_keeper")
      .collect().map(_.toString).sorted
    val b = spark.read.parquet(s"$root/output").select("url", "cluster_id", "is_keeper")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))

    // metrics rows present per partition with lineage fingerprint
    val m = spark.read.parquet(s"$root/metrics")
    assert(m.select("day").distinct().count() == 3)
    assert(m.filter(col("inputFingerprint").isNull).count() == 0)
    assert(m.filter(col("nDocsIn") <= 0).count() == 0)

    // config change invalidates checkpoints (different hash -> full rerun)
    val rerun = Checkpoint.runIncremental(spark, pages, root, cfg.copy(threshold = 0.95))
    assert(rerun.size == 3)
  }

  test("multimodal stub pipeline: schema, determinism, batch shape") {
    val media = Multimodal.generateMedia(spark, 200, seed = 9L)
    assert(media.schema.fieldNames.toSet ==
      Set("media_id", "kind", "bytes", "source_url"))
    assert(media.schema("bytes").dataType.typeName == "binary")

    val feats = Multimodal.extractFeatures(spark, media, batchSize = 64)
    val rows = feats.collect()
    assert(rows.length == 200)
    val again = Multimodal.extractFeatures(spark, media, batchSize = 7).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted),
      "batch size must not change results")
    // embeddings normalized; image rows have dims, a/v rows have duration
    feats.select("kind", "width", "duration_ms").collect().foreach { r =>
      if (r.getString(0) == "image") assert(r.getInt(1) > 0 && r.getInt(2) == 0)
      else assert(r.getInt(1) == 0 && r.getInt(2) >= 0)
    }
  }
}
