package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{DedupConfig, DedupPipeline}
import graft.sources.PagesGen

/** Dev-only A/B probe: does enlarging the shuffle write/compression buffers
  * reduce the host *kernel* time the 32-thread dedup runs burn? Motivation:
  * the round-4 bench rehearsal measured hi-level runs at 780-1,334 s of
  * host sys inside a ~170 s window (32 concurrent tmpfs shuffle writers,
  * default 32 KB file buffers and LZ4 blocks mean ~10^6 small write+compress
  * calls), while 8-thread runs of the same job showed ~100 s. If kernel
  * contention — not only hypervisor steal — is part of the hi-level tax,
  * fewer/larger syscalls should show up directly as lower sys seconds at
  * equal work. Interleaves A (defaults) and B (1 MB file buffer, 512 KB
  * LZ4 blocks) runs; each run is a fresh local[cpus] session over the same
  * parqueted corpus. Usage:
  *   SPARK_GRAFT_NDOCS=600000 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
  *     sbt "runMain graft.ShufSysProbe"
  */
object ShufSysProbe {

  private def hostCpu(): (Double, Double) = try {
    val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      .split("\\s+").drop(1).map(_.toDouble)
    (l(2) / 100.0, (if (l.length > 7) l(7) else 0.0) / 100.0) // (sys, steal)
  } catch { case _: Throwable => (0.0, 0.0) }

  private def session(cpus: Int, buffered: Boolean): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-shufsys-${if (buffered) "B" else "A"}")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString) // 4 waves: cap per-task memory (see Bench.build)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s") // survive host throttle windows
      .config("spark.network.timeout", "600s")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-probe"
        else System.getProperty("java.io.tmpdir"))
    val b2 =
      if (buffered) b
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.io.compression.lz4.blockSize", "512k")
        .config("spark.shuffle.spill.diskWriteBufferSize", "1m")
      else b
    val s = b2.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_NDOCS", "600000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val scratch =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-probe"
      else "target"
    val corpusPath = s"$scratch/stage-corpus.parquet"
    if (!new java.io.File(corpusPath).exists()) {
      val gen = session(cpus, buffered = false)
      PagesGen.generate(gen, nDocs, nDomains = 500, seed = 42L)
        .write.mode("overwrite").parquet(corpusPath)
      gen.stop()
    }
    // one untimed warmup (JIT is JVM-wide, so both arms run hot code)
    locally {
      val w = session(cpus, buffered = false)
      val pages = w.read.parquet(corpusPath).limit(30000)
      DedupPipeline.run(w, pages, DedupConfig()).count(): Unit
      w.stop()
    }
    (1 to reps).foreach { r =>
      Seq(false, true).foreach { buffered =>
        val spark = session(cpus, buffered)
        val pages = spark.read.parquet(corpusPath)
          .select("url", "warc_ts", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pages.count()
        val h0 = hostCpu()
        val t0 = System.nanoTime()
        val n = DedupPipeline.run(spark, pages, DedupConfig()).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val h1 = hostCpu()
        println(f"[shufsys] rep=$r arm=${if (buffered) "B_buffered" else "A_default"} sec=$sec%7.1f docs_per_sec=${nDocs / sec}%8.1f sys=${h1._1 - h0._1}%7.1f steal=${h1._2 - h0._2}%7.1f out=$n")
        spark.stop()
      }
    }
  }
}
