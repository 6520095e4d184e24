package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.MinHash

/** Structured-Streaming surfaces of the engine (SURVEY §2.9): the
  * reference is batch-incremental, but its concerns (late data, watermark
  * windows, incremental dedup-on-arrival) map to these streaming plans.
  * All take an unbounded DataFrame (readStream source) and return a
  * streaming DataFrame to be wired to any sink.
  */
object Streaming {

  /** Streaming exact dedup-on-write (reference upsert S6): keep the first
    * arrival per content hash within the watermark horizon.
    */
  def exactDedupStream(pages: DataFrame, watermark: String = "1 day"): DataFrame =
    pages
      .withColumn("content_md5", md5(col("text")))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("content_md5")

  /** Watermarked tumbling-window event rollup (A5/A6 in streaming form). */
  def windowedEventStats(events: DataFrame, window_ : String = "1 hour",
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Stateful streaming near-dup flagging: documents keyed by a coarse
    * SimHash prefix bucket; per bucket we keep up to `maxPerBucket` recent
    * (simhash, url) pairs in state and flag an arriving doc as a near-dup
    * of the first state entry within `maxHamming`. This is the
    * `KeyValueGroupedDataset.flatMapGroupsWithState` surface; exact global
    * clustering stays the batch pipeline's job.
    */
  final case class DocIn(url: String, simhash: Long)
  final case class BucketState(hashes: List[(Long, String)])
  final case class DupFlag(url: String, dupOf: String, hamming: Int)

  def nearDupFlags(spark: SparkSession, docs: DataFrame,
                   prefixBits: Int = 16, maxHamming: Int = 6,
                   maxPerBucket: Int = 64): DataFrame = {
    import spark.implicits._
    val keyed = docs.select(col("url"), col("simhash"))
      .as[DocIn]
      .groupByKey(d => d.simhash >>> (64 - prefixBits))

    val flagged = keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (_: Long, rows: Iterator[DocIn], state: GroupState[BucketState]) => {
        var st = state.getOption.getOrElse(BucketState(Nil))
        val out = scala.collection.mutable.ArrayBuffer[DupFlag]()
        rows.foreach { d =>
          st.hashes.iterator
            .map { case (h, u) => (MinHash.hamming(h, d.simhash), u) }
            .filter(_._1 <= maxHamming)
            .take(1)
            .foreach { case (hd, u) => out += DupFlag(d.url, u, hd) }
          st = BucketState(((d.simhash, d.url) :: st.hashes).take(maxPerBucket))
        }
        state.update(st)
        out.iterator
      })
    flagged.toDF()
  }
}
