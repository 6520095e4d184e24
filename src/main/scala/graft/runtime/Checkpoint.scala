package graft.runtime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.operators.{DedupConfig, DedupPipeline}

/** Per-partition checkpointed, idempotently-resumable pipeline runs with
  * lineage + metrics tables.
  *
  * Mirrors the reference's durable-state design: a checkpoint is written
  * atomically *after* a step completes (`recap/tasks/base.py:119-120`),
  * completed phases are skipped on resume (`base.py:140-161`), and run
  * metrics (docs in/out, clusters, duplicates, elapsed) mirror
  * `IngestionRunRecord` (`ingestion/models.py:211-227`).
  *
  * Here the unit of work is a day partition of the pages table (the
  * reference's daily stores, `ingestion/repository.py:77-109`). Layout:
  *
  *   <root>/output/day=YYYY-MM-DD/   cluster assignments parquet
  *   <root>/checkpoints/             append-only checkpoint rows
  *   <root>/metrics/                 append-only per-partition metrics
  *
  * A partition is "done" iff a checkpoint row with status=COMPLETED and the
  * same config hash exists. Resume = anti-join of planned days against done
  * days (SURVEY §2.4 J6). Output writes are idempotent (overwrite per
  * partition directory); the checkpoint row is committed only after the
  * output write returns, so a crash between the two re-processes that
  * partition into an identical overwrite — exactly-once observable effect.
  */
object Checkpoint {

  final case class RunMetrics(
      day: String, configHash: String, nDocsIn: Long, nClustered: Long,
      nClusters: Long, nDuplicatesRemoved: Long, elapsedMs: Long,
      inputFingerprint: Long, status: String, startedAtMs: Long)

  def configHash(cfg: DedupConfig): String = {
    val s = s"${cfg.shingleK}|${cfg.numHashes}|${cfg.bands}|${cfg.threshold}|${cfg.maxGroupSize}|${cfg.seed}"
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  def completedDays(spark: SparkSession, root: String, cfgHash: String): Set[String] = {
    val dir = new java.io.File(s"$root/checkpoints")
    if (!dir.exists() || dir.listFiles().forall(f => f.getName.startsWith("_") || f.getName.startsWith("."))) return Set.empty
    spark.read.parquet(s"$root/checkpoints")
      .filter(col("status") === "COMPLETED" && col("configHash") === cfgHash)
      .select("day").distinct().collect().map(_.getString(0)).toSet
  }

  /** Retention GC (reference `storage/io.py:66-91`): drop output day
    * partitions and their checkpoint/metrics rows strictly older than
    * `cutoffDay` (lexicographic yyyy-MM-dd compare, as the reference does).
    * Returns the deleted day keys.
    */
  def gc(spark: SparkSession, root: String, cutoffDay: String): Seq[String] = {
    import spark.implicits._
    val outDir = new java.io.File(s"$root/output")
    val victims = Option(outDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .filter(_.getName.stripPrefix("day=") < cutoffDay)
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
      f.delete(): Unit
    }
    victims.foreach(rmTree)
    // rewrite the small bookkeeping tables without the dropped days
    Seq("checkpoints", "metrics").foreach { t =>
      val dir = new java.io.File(s"$root/$t")
      if (dir.exists()) {
        val kept = spark.read.parquet(dir.toString)
          .filter(col("day") >= cutoffDay).collect()
        val schema = spark.read.parquet(dir.toString).schema
        rmTree(dir)
        spark.createDataFrame(java.util.Arrays.asList(kept: _*), schema)
          .write.parquet(dir.toString)
      }
    }
    victims.map(_.getName.stripPrefix("day=")).toSeq.sorted
  }

  /** Process every day partition of `pages` not yet checkpointed; returns
    * the list of days processed this run. `failAfter` injects a crash after
    * N partitions (test hook for the kill/rerun fixture).
    */
  def runIncremental(spark: SparkSession, pages: DataFrame, root: String,
                     cfg: DedupConfig = DedupConfig(),
                     failAfter: Int = Int.MaxValue): Seq[String] = {
    val cfgHash = configHash(cfg)
    val withDay = pages.withColumn("day", Fns.dayKey(col("warc_ts")))
    val allDays = withDay.select("day").distinct().collect().map(_.getString(0)).sorted
    val done = completedDays(spark, root, cfgHash)
    val todo = allDays.filterNot(done)

    var processed = 0
    val out = scala.collection.mutable.ArrayBuffer[String]()
    todo.foreach { day =>
      if (processed >= failAfter)
        throw new RuntimeException(s"injected failure before partition $day")
      val t0 = System.currentTimeMillis()
      val dayPages = withDay.filter(col("day") === day).drop("day")
      val nIn = dayPages.count()
      // lineage: order-insensitive fingerprint of the partition's input keys
      // (bit_xor, not sum — overflow-free under ANSI mode)
      val fp = dayPages.agg(expr("bit_xor(xxhash64(url, warc_ts))"))
        .first().getLong(0)
      val clusters = DedupPipeline.run(spark, dayPages, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nClustered = clusters.count()
      val nClusters = clusters.select("cluster_id").distinct().count()
      clusters.write.mode(SaveMode.Overwrite).parquet(s"$root/output/day=$day")
      clusters.unpersist()
      val m = RunMetrics(day, cfgHash, nIn, nClustered, nClusters,
        nClustered - nClusters, System.currentTimeMillis() - t0, fp,
        "COMPLETED", t0)
      import spark.implicits._
      Seq(m).toDF().write.mode(SaveMode.Append).parquet(s"$root/metrics")
      // checkpoint row LAST — commit point of the partition
      Seq((day, cfgHash, "COMPLETED", System.currentTimeMillis()))
        .toDF("day", "configHash", "status", "committedAtMs")
        .write.mode(SaveMode.Append).parquet(s"$root/checkpoints")
      processed += 1
      out += day
    }
    out.toSeq
  }
}
