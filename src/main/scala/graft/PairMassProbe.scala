package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupConfig, DedupPipeline}
import graft.sources.PagesGen

/** Dev-only probe: candidate-pair mass vs hamming-gate threshold plus the
  * TRUE-edge hamming distribution, at bench-corpus scale. This is the
  * evidence base for the SimHash pre-gate default: the gate's cost model is
  * "every point of hamming slack admits ~X more noise-pair shuffle rows",
  * and its recall model is "no cosine>=threshold pair exceeds hamming H at
  * corpus scale N". Usage:
  *   SPARK_GRAFT_NDOCS=600000 sbt "runMain graft.PairMassProbe"
  */
object PairMassProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_NDOCS", "600000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pairmass-probe")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString) // 4 waves: cap per-task memory (see Bench.build)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s") // survive host throttle windows
      .config("spark.network.timeout", "600s")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-probe"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scratch =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-probe"
      else "target"
    // keyed by nDocs (an unkeyed path silently reuses a differently-sized
    // corpus across probe runs); prefer the bench's identical corpus when
    // one already sits in tmpfs
    val benchCorpus = s"/dev/shm/graft-bench/corpus-n$nDocs-seed42.parquet"
    val corpusPath =
      if (new java.io.File(s"$benchCorpus/_SUCCESS").exists()) benchCorpus
      else s"$scratch/corpus-n$nDocs-seed42.parquet"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists())
      PagesGen.generate(spark, nDocs, nDomains = 500, seed = 42L)
        .write.mode("overwrite").parquet(corpusPath)
    val pages = spark.read.parquet(corpusPath).select("url", "warc_ts", "text")

    // SPARK_GRAFT_PAIRMASS_MODE:
    //   all  (default) — raw histograms over the UNGATED pair stream + true
    //          edges from the ungated distinct set (600 k scale fits RAM);
    //   hist — raw histograms only;
    //   edges — true-edge histograms from the 64-BIT-GATED pair set only.
    //          At 2 M docs the ungated set (183.6 M distinct pairs x sparse
    //          vectors) OOMs the box, while gate 23 provably keeps every
    //          true edge (max observed 64-bit hamming is 21 at 2 M docs,
    //          round-5 evidence) — so the gated set yields the IDENTICAL
    //          edge histograms at ~6x less memory.
    val mode = sys.env.getOrElse("SPARK_GRAFT_PAIRMASS_MODE", "all")
    val cfg =
      if (mode == "edges") DedupConfig(simhash128PregateMaxHamming = -1)
      else DedupConfig(simhashPregateMaxHamming = -1,
        simhash128PregateMaxHamming = -1)
    val sigs = DedupPipeline.signatures(pages, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[pairmass] sig rows=${sigs.count()}")

    // Raw band-join pair stream (pre-dedup, pre-gate) with hamming: this is
    // what crosses the pair-dedup exchange at a given gate. Count per
    // hamming bucket once, derive every gate's cost from the histogram —
    // for BOTH the 64-bit hamming (the shipped round-5 gate) and the
    // 128-bit hamming (the round-6 gate under evaluation).
    val rawPairs = DedupPipeline.candidatesRaw(sigs, cfg, emitHamming128 = true)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    def cumHist(name: String, colName: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val hist = df.groupBy(col(colName)).agg(count(lit(1)).as("n"))
        .orderBy(col(colName)).collect()
      val total = hist.map(_.getLong(1)).sum
      println(s"[pairmass] $name rows: $total")
      var cum = 0L
      hist.foreach { r =>
        cum += r.getLong(1)
        println(f"[pairmass] $name<=${r.getInt(0)}%3d cum_rows=$cum%12d (${100.0 * cum / total}%5.1f%%)")
      }
    }
    if (mode != "edges") {
      cumHist("hamming64", "simhash_hamming", rawPairs)
      cumHist("hamming128", "simhash_hamming128", rawPairs)
    }
    if (mode == "hist") { spark.stop(); return }

    // Distinct candidate pairs and verified (cosine>=0.90) edges, with the
    // true-edge hamming distribution (64- and 128-bit): the recall
    // evidence for both gates.
    val distinctPairs = rawPairs.dropDuplicates("uid_a", "uid_b")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"[pairmass] distinct candidate pairs: ${distinctPairs.count()}")
    val edges = DedupPipeline.verifiedEdges(sigs, distinctPairs, cfg)
      .join(distinctPairs.select(col("uid_a"), col("uid_b"), col("simhash_hamming128")),
        Seq("uid_a", "uid_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[pairmass] verified edges (cosine>=${cfg.threshold}): ${edges.count()}")
    Seq(("hamming64", "simhash_hamming"), ("hamming128", "simhash_hamming128"))
      .foreach { case (label, c) =>
        val edgeHist = edges.groupBy(col(c)).agg(count(lit(1)).as("n"))
          .orderBy(col(c)).collect()
        edgeHist.foreach { r =>
          println(f"[pairmass] EDGE $label=${r.getInt(0)}%3d n=${r.getLong(1)}%10d")
        }
        val maxH = if (edgeHist.nonEmpty) edgeHist.map(_.getInt(0)).max else -1
        println(s"[pairmass] max true-edge $label at nDocs=$nDocs: $maxH")
      }
    spark.stop()
  }
}
