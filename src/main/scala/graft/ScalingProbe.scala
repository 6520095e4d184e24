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
      // default 4 waves (see Bench.build); SPARK_GRAFT_SHUFPARTS overrides
      // for A/B-ing the partition count at a fixed parallelism
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFPARTS", (cpus * 4).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s") // survive host throttle windows
      .config("spark.network.timeout", "600s")
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
    // warmup at fixture scale so the FIRST probed level isn't paying JIT
    // (Bench warms up the same way before its timed runs)
    locally {
      val s = build(8)
      try DedupPipeline.run(s,
        PagesGen.generate(s, 20000, nDomains = 500, seed = 42L), cfg).count(): Unit
      finally s.stop()
    }
    levels.foreach { cpus =>
      val spark = build(cpus)
      // SPARK_GRAFT_JOBLOG=1: per-job wall times — the pipeline's serial
      // fixed cost F is the sum of small-data job barriers, and this is
      // the direct way to see which ones dominate at the hi level.
      if (sys.env.get("SPARK_GRAFT_JOBLOG").contains("1")) {
        val t00 = System.nanoTime()
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, (System.nanoTime(),
              Option(j.properties.getProperty("spark.job.description")).getOrElse(""))): Unit
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val st = starts.remove(j.jobId)
            if (st != null) println(f"[job] cpus=$cpus id=${j.jobId}%3d t=${(st._1 - t00) / 1e9}%7.1f dur=${(System.nanoTime() - st._1) / 1e9}%7.2f ${st._2.take(60)}")
          }
        })
      }
      try {
        // same per-task metrics as Bench: cpu/gc/read/shuffle attribution
        val cpuNs = new java.util.concurrent.atomic.AtomicLong
        val gcMs = new java.util.concurrent.atomic.AtomicLong
        val readB = new java.util.concurrent.atomic.AtomicLong
        val shufB = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              val m = te.taskMetrics
              if (m != null) {
                cpuNs.addAndGet(m.executorCpuTime)
                gcMs.addAndGet(m.jvmGCTime)
                readB.addAndGet(m.inputMetrics.bytesRead)
                shufB.addAndGet(m.shuffleReadMetrics.totalBytesRead +
                  m.shuffleWriteMetrics.bytesWritten): Unit
              }
            }
          })
        // corpus parqueted once and shared across levels/retries (same
        // protocol as Bench: identical input bytes per run, generation
        // excluded from all timings)
        val scratch =
          if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-probe"
          else "target"
        // SPARK_GRAFT_CORPUS: reuse an existing corpus (e.g. the bench's
        // /dev/shm/graft-bench/corpus-n*-seed42.parquet) instead of
        // generating a probe-local copy.
        val corpusPath = sys.env.getOrElse("SPARK_GRAFT_CORPUS",
          s"$scratch/stage-corpus-$nDocs.parquet")
        if (!new java.io.File(corpusPath).exists())
          PagesGen.generate(spark, nDocs, nDomains = 500, seed = 42L)
            .write.mode("overwrite").parquet(corpusPath)
        val pages = spark.read.parquet(corpusPath)
          .select("url", "warc_ts", "text")
          .persist(DedupPipeline.bigCacheLevel)
        pages.count()
        cpuNs.set(0); gcMs.set(0); readB.set(0); shufB.set(0)
        // host steal/system around the timed run (same attribution as
        // Bench): a hypervisor-throttle window shows up here, not in the
        // engine
        def hostCpu(): (Double, Double) = try {
          val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
            .split("\\s+").drop(1).map(_.toDouble)
          (l(2) / 100.0, (if (l.length > 7) l(7) else 0.0) / 100.0)
        } catch { case _: Throwable => (0.0, 0.0) }
        val h0 = hostCpu()
        val t0 = System.nanoTime()
        val n = DedupPipeline.run(spark, pages, cfg).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val h1 = hostCpu()
        Thread.sleep(500) // drain the async listener bus
        println(f"[probe] cpus=$cpus%2d nDocs=$nDocs sec=$sec%8.2f docs_per_sec=${nDocs / sec}%9.1f outRows=$n cpu_core_sec=${cpuNs.get / 1e9}%8.1f gc_sec=${gcMs.get / 1e3}%6.1f read_mb=${readB.get / 1e6}%9.1f shuffle_mb=${shufB.get / 1e6}%9.1f shuffle_b_per_doc=${shufB.get / nDocs}%6d host_sys_sec=${h1._1 - h0._1}%7.1f host_steal_sec=${h1._2 - h0._2}%5.1f")
        pages.unpersist()
      } finally spark.stop()
    }
  }
}
