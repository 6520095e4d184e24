package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.operators.{DedupConfig, DedupPipeline}
import graft.sources.PagesGen

/** Dev-only probe: per-stage shuffle/cpu attribution for one dedup run, to
  * locate WHERE the pipeline's shuffle bytes come from (the aggregate
  * number in Bench/ScalingProbe can't say which join pays). Usage:
  *   SPARK_GRAFT_NDOCS=600000 SPARK_GRAFT_CPUS=32 sbt "runMain graft.StageProbe"
  * Prints one line per stage (sorted by shuffle bytes desc): stage name +
  * callsite, tasks, cpu sec, shuffle read/write MB.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_NDOCS", "600000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // At stress scale (5M docs ~ 70 GB cumulative shuffle) tmpfs pages
    // would compete with the JVM heap for the same physical RAM, so the
    // scratch dir must be overridable onto the real disk.
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-probe"
      else System.getProperty("java.io.tmpdir"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stage-probe")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString) // 4 waves: cap per-task memory (see Bench.build)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s") // survive host throttle windows
      .config("spark.network.timeout", "600s")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Agg(var tasks: Int = 0, var cpuNs: Long = 0L,
                         var shufR: Long = 0L, var shufW: Long = 0L,
                         var inB: Long = 0L)
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val aggs = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        // first line of the callsite identifies the operator that forced the stage
        val site = e.stageInfo.details.linesIterator.toSeq
          .find(l => l.contains("graft.") && !l.contains("StageProbe"))
          .getOrElse(e.stageInfo.details.linesIterator.nextOption().getOrElse(""))
        names.put(e.stageInfo.stageId, s"${e.stageInfo.name} @ ${site.trim}"): Unit
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val a = aggs.computeIfAbsent(te.stageId, _ => Agg())
          a.synchronized {
            a.tasks += 1
            a.cpuNs += m.executorCpuTime
            a.shufR += m.shuffleReadMetrics.totalBytesRead
            a.shufW += m.shuffleWriteMetrics.bytesWritten
            a.inB += m.inputMetrics.bytesRead
          }
        }
      }
    })

    val scratch =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-probe"
      else "target"
    val corpusPath =
      if (nDocs == 600000L) s"$scratch/stage-corpus.parquet" // shared with ShufSysProbe
      else s"$scratch/stage-corpus-$nDocs.parquet"
    if (!new java.io.File(corpusPath).exists())
      PagesGen.generate(spark, nDocs, nDomains = 500, seed = 42L)
        .write.mode("overwrite").parquet(corpusPath)
    val pages = spark.read.parquet(corpusPath)
      .select("url", "warc_ts", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count()
    names.clear(); aggs.clear()
    val t0 = System.nanoTime()
    val n = DedupPipeline.run(spark, pages, DedupConfig()).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800) // drain listener bus
    println(f"[stageprobe] nDocs=$nDocs cpus=$cpus sec=$sec%.1f outRows=$n")
    import scala.jdk.CollectionConverters._
    val rows = aggs.asScala.toSeq.sortBy { case (_, a) => -(a.shufR + a.shufW) }
    var totR = 0L; var totW = 0L
    rows.foreach { case (sid, a) =>
      totR += a.shufR; totW += a.shufW
      if (a.shufR + a.shufW > 0 || a.cpuNs > 5e9)
        println(f"[stage] id=$sid%4d cpu=${a.cpuNs / 1e9}%7.1f shufR_mb=${a.shufR / 1e6}%8.1f shufW_mb=${a.shufW / 1e6}%8.1f in_mb=${a.inB / 1e6}%8.1f tasks=${a.tasks}%4d  ${names.getOrDefault(sid, "?")}")
    }
    println(f"[stageprobe] total shufR_mb=${totR / 1e6}%.1f shufW_mb=${totW / 1e6}%.1f per_doc_b=${(totR + totW) / nDocs}")
    spark.stop()
  }
}
