package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (SURVEY §4): Zipf-hot keys (domains, boilerplate
  * shingles) make single reducers the bottleneck at scale. Two tools:
  *
  *   - `saltedAgg`: two-phase aggregation — partial per (key, salt) then
  *     final per key. Identical results to a direct groupBy; the first
  *     shuffle spreads a hot key over `salts` reducers. (AQE mitigates
  *     skewed *joins* automatically; skewed *aggregations* still need the
  *     salt.)
  *   - `capHotBuckets`: drops LSH/shingle buckets whose row count exceeds a
  *     document-frequency cap (boilerplate-only collisions that would
  *     produce O(n²) candidate pairs while carrying no dedup signal).
  */
object SkewOps {

  /** Two-phase count+sum aggregation by `key`, salted over `salts` reducers.
    * Returns (key, n, total) — bit-identical to the unsalted plan for
    * integral sums.
    */
  def saltedAgg(df: DataFrame, key: Column, valueExpr: Column, salts: Int = 16): DataFrame = {
    val partial = df
      .groupBy(key.as("key"), pmod(xxhash64(rand(42) * 1e9), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(valueExpr).as("pv"))
    partial.groupBy(col("key"))
      .agg(sum(col("pn")).as("n"), sum(col("pv")).as("total"))
  }

  /** Salt derived from a deterministic column (preferred: keeps the plan
    * deterministic row-for-row; use when a unique row key exists).
    */
  def saltedAggBy(df: DataFrame, key: Column, saltSource: Column,
                  valueExpr: Column, salts: Int = 16): DataFrame = {
    val partial = df
      .groupBy(key.as("key"), pmod(xxhash64(saltSource), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(valueExpr).as("pv"))
    partial.groupBy(col("key"))
      .agg(sum(col("pn")).as("n"), sum(col("pv")).as("total"))
  }

  /** Drop groups of `bucketCol` with more than `maxDf` rows. */
  def capHotBuckets(df: DataFrame, bucketCol: Column, maxDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_df", count(lit(1)).over(Window.partitionBy(bucketCol)))
      .filter(col("_df") <= maxDf)
      .drop("_df")
  }
}
