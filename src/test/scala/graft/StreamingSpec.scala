package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.MinHash
import graft.streaming.Streaming

/** Structured Streaming surfaces driven by MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("streaming exact dedup keeps first arrival per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp, String)]
    val df = in.toDF().toDF("url", "warc_ts", "text")
    val q = Streaming.exactDedupStream(df)
      .select("url", "content_md5")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    in.addData(("u1", t0, "same text"), ("u2", t0, "same text"), ("u3", t0, "other"))
    q.processAllAvailable()
    in.addData(("u4", t0, "same text"), ("u5", t0, "third"))
    q.processAllAvailable()
    val out = spark.table("dedup_out").collect().map(_.getString(0)).sorted
    q.stop()
    // u2/u4 are dup arrivals of u1's content within the watermark
    assert(out.sameElements(Array("u1", "u3", "u5")), out.mkString(","))
  }

  test("stateful near-dup flagging via flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = MinHash.simHash(MinHash.shingles("the quick brown fox jumps over the lazy dog " * 5, 3))
    val near = base ^ 0x7L // hamming 3
    val far = MinHash.simHash(MinHash.shingles("completely different content about ships " * 5, 3))
    val in = MemoryStream[(String, Long)]
    val q = Streaming.nearDupFlags(spark, in.toDF().toDF("url", "simhash"))
      .writeStream.format("memory").queryName("flags_out")
      .outputMode("append").start()
    in.addData(("a", base), ("b", far))
    q.processAllAvailable()
    in.addData(("c", near), ("d", far ^ (1L << 63))) // d differs in the bucket prefix
    q.processAllAvailable()
    val flags = spark.table("flags_out").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    q.stop()
    assert(flags.toSeq == Seq(("c", "a", 3)), flags.mkString(","))
  }

  test("watermarked windowed event rollup (streaming agg)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Streaming.windowedEventStats(in.toDF().toDF("ts", "event_type", "value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData((ts("2026-01-01 10:05:00"), "click", 1.0),
      (ts("2026-01-01 10:55:00"), "click", 2.0),
      (ts("2026-01-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    q.stop()
    assert(rows.toSeq == Seq(
      ("2026-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2026-01-01 11:00:00.0", "view", 1L, 5.0)), rows.mkString(","))
  }
}
