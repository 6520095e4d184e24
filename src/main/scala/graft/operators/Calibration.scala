package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Threshold-calibration harness (SURVEY §2.5 A9; reference
  * `recap/dedup/calibration.py:64-143`): given labeled pairs with a
  * similarity score, compute TP/FP/FN + precision/recall/F1 per candidate
  * threshold and the argmax-F1 threshold.
  *
  * Pairs x thresholds is a broadcast cross join of a tiny threshold grid
  * against the (large) pair table, aggregated per threshold — one shuffle
  * of `|grid|` groups regardless of pair count.
  */
object Calibration {

  val DefaultGrid: Seq[Double] =
    (80 to 99).map(_ / 100.0) // 0.80 .. 0.99, reference's candidate grid

  /** pairs: (sim: double, label: int 0/1) -> per-threshold metrics. */
  def grid(spark: SparkSession, pairs: DataFrame,
           thresholds: Seq[Double] = DefaultGrid): DataFrame = {
    import spark.implicits._
    val grid = broadcast(thresholds.toDF("threshold"))
    pairs.crossJoin(grid)
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("sim") >= col("threshold") && col("label") === 1, 1).otherwise(0)).as("tp"),
        sum(when(col("sim") >= col("threshold") && col("label") === 0, 1).otherwise(0)).as("fp"),
        sum(when(col("sim") < col("threshold") && col("label") === 1, 1).otherwise(0)).as("fn"))
      .withColumn("precision", try_divide(col("tp").cast("double"), col("tp") + col("fp")))
      .withColumn("recall", try_divide(col("tp").cast("double"), col("tp") + col("fn")))
      .withColumn("f1", try_divide(lit(2.0) * col("precision") * col("recall"),
        col("precision") + col("recall")))
      .orderBy("threshold")
  }

  /** Argmax-F1 threshold (ties -> lowest threshold, as Python max-first). */
  def bestThreshold(spark: SparkSession, pairs: DataFrame,
                    thresholds: Seq[Double] = DefaultGrid): Double = {
    grid(spark, pairs, thresholds)
      .orderBy(col("f1").desc_nulls_last, col("threshold").asc)
      .select("threshold").first().getDouble(0)
  }

  /** Build a labeled pair table from a pages corpus with generator truth:
    * positive = same truth_family (dups), negative = cross-family sample.
    */
  def labeledPairsFromTruth(pages: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val sigs = DedupPipeline.signatures(
      pages.filter(col("truth_family") >= 0 || pmod(xxhash64(col("url")), lit(10)) === 0), cfg)
    val withFam = sigs.join(
      pages.select(col("url"), col("truth_family")), "url")
    val a = withFam.select(col("uid").as("uid_a"), col("svec").as("svec_a"),
      col("truth_family").as("fam_a"), pmod(xxhash64(col("url")), lit(64)).as("g"))
    val b = withFam.select(col("uid").as("uid_b"), col("svec").as("svec_b"),
      col("truth_family").as("fam_b"), pmod(xxhash64(col("url")), lit(64)).as("g"))
    // bucketed pairing keeps this harness O(n) — pairs within a hash bucket
    a.join(b, Seq("g")).filter(col("uid_a") < col("uid_b"))
      .select(
        graft.functions.Fns.cosineSparseCol(col("svec_a"), col("svec_b")).as("sim"),
        when(col("fam_a") >= 0 && col("fam_a") === col("fam_b"), 1).otherwise(0).as("label"))
  }
}
