package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (SURVEY §4): Zipf-hot keys (domains, boilerplate
  * shingles) make single reducers the bottleneck at scale. Two tools:
  *
  *   - `saltedAggBy`: two-phase aggregation — partial per (key, salt) then
  *     final per key. Identical results to a direct groupBy; the first
  *     shuffle spreads a hot key over `salts` reducers. (AQE mitigates
  *     skewed *joins* automatically; skewed *aggregations* still need the
  *     salt.) The salt derives from a deterministic column so task retries
  *     re-salt identically — never from `rand()`.
  *   - `capHotBuckets`: drops LSH/shingle buckets whose row count exceeds a
  *     document-frequency cap (boilerplate-only collisions that would
  *     produce O(n²) candidate pairs while carrying no dedup signal).
  */
object SkewOps {

  /** Two-phase count+sum aggregation by `key`, salted over `salts` reducers
    * via a deterministic salt column (a unique row key). Bit-identical to
    * the unsalted plan for integral sums, and deterministic under task
    * retries (a `rand()`-based salt re-salts differently mid-stage).
    */
  def saltedAggBy(df: DataFrame, key: Column, saltSource: Column,
                  valueExpr: Column, salts: Int = 16): DataFrame = {
    val partial = df
      .groupBy(key.as("key"), pmod(xxhash64(saltSource), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(valueExpr).as("pv"))
    partial.groupBy(col("key"))
      .agg(sum(col("pn")).as("n"), sum(col("pv")).as("total"))
  }

  /** Dense 0-based index by a global sort order WITHOUT an unpartitioned
    * window (which funnels every row through one task). Two-pass
    * `zipWithIndex` scheme: range-partition by the order column, count rows
    * per partition (a P-row metadata collect, exactly what
    * `RDD.zipWithIndex` does), then `row_number` within each partition plus
    * its partitions-before offset. The only per-row window is partitioned
    * by `spark_partition_id`, whose groups are the (balanced) range
    * partitions themselves.
    */
  def globalDenseIndex(df: DataFrame, order: Column, outCol: String): DataFrame = {
    val (lazyOut, withPid) = denseIndexPlan(df, order, outCol)
    // Materialize the result EAGERLY from the cached partitioning, then
    // release the cache. Both halves matter: repartitionByRange SAMPLES, so
    // a lazy result recomputed after unpersist could land rows in different
    // partitions than the counts were taken from (wrong indices); and
    // without the unpersist, per-day callers (BlockDedup renumbering in
    // long incremental runs) would accumulate cached partitions for the
    // life of the session (round-3 review finding).
    val out = lazyOut.localCheckpoint(true)
    withPid.unpersist()
    out
  }

  /** The lazy plan behind [[globalDenseIndex]] plus its internal cached
    * frame — exposed so tests can assert plan shape (no SinglePartition
    * funnel) before the checkpoint hides it.
    */
  private[graft] def denseIndexPlan(df: DataFrame, order: Column,
                                    outCol: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val withPid = df.repartitionByRange(order)
      .withColumn("_pid", org.apache.spark.sql.functions.spark_partition_id())
      .persist()
    val counts = withPid.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_pid")).collect() // P rows of metadata, not data
    var acc = 0L
    val offsets = counts.map { r => val o = acc; acc += r.getLong(1); (r.getInt(0), o) }
    val offsetsDf = broadcast(
      df.sparkSession.createDataFrame(offsets.toSeq).toDF("_pid", "_offset"))
    val out = withPid.join(offsetsDf, "_pid")
      .withColumn(outCol,
        row_number().over(Window.partitionBy(col("_pid")).orderBy(order))
          + col("_offset") - 1)
      .drop("_pid", "_offset")
    (out, withPid)
  }

  /** Drop rows whose `bucketCols` group has more than `maxDf` rows.
    *
    * Skew-safe by construction: the group sizes come from a groupBy (whose
    * partial aggregation collapses each map partition's contribution to a
    * hot key before the shuffle — a window over the bucket key would
    * instead sort the entire hot bucket in one task), and the hot-key set
    * (at most totalRows/maxDf entries, tiny by definition) anti-joins back
    * as an AQE broadcast.
    */
  def capHotBuckets(df: DataFrame, bucketCols: Seq[Column], maxDf: Long): DataFrame = {
    val names = bucketCols.zipWithIndex.map { case (_, i) => s"_bk$i" }
    val keyed = df.withColumns(names.zip(bucketCols).toMap)
    val hot = keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDf)
      .select(names.map(col): _*)
    keyed.join(hot, names, "left_anti").drop(names: _*)
  }
}
