package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list, as iterative
  * DataFrame min-label propagation (no GraphFrames, no RDDs).
  *
  * Replaces the reference's in-memory BFS (`recap/dedup/cluster.py:73-91`).
  * Labels are the vertex keys themselves (here: 128-bit uid structs — unique
  * by input contract, so collision-free at any scale); each iteration every
  * vertex takes the min of its own label and its neighbors' labels.
  * Converges in O(max component diameter) rounds — dedup components are
  * near-cliques (verified-pair subgraphs of near-identical docs), so this is
  * 2-3 rounds in practice.
  *
  * Cost model: ONE Spark job per round. The convergence signal (count of
  * vertices whose label shrank) is computed inside the same pass via
  * `Dataset.observe` — the old label rides the union as a second column and
  * an observed aggregate compares it against the new min, so no separate
  * fingerprint/change job ever scans the labels. `localCheckpoint` both
  * materializes the round (triggering the observed metrics) and truncates
  * lineage so plan size stays constant across rounds.
  *
  * @param edges DataFrame with columns (src, dst) — one row per undirected
  *              edge, either direction.
  * @param vertices DataFrame with column (id) — all vertices (isolated ones
  *                 come out as their own singleton component).
  * @return DataFrame (id, component) where component = min vertex key of the
  *         component under the key's natural ordering.
  */
object ConnectedComponents {

  /** Observed metric value after its query's action completed. The metric is
    * delivered via an async listener; the bounded wait covers listener lag
    * without risking a hang if the action type never reports (callers keep a
    * computed fallback).
    */
  private[operators] def observedLong(obs: Observation, key: String): Option[Long] = {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    try {
      Await.result(obs.future, 30.seconds).getAs[Any](key) match {
        case n: java.lang.Long => Some(n.longValue())
        case n: java.lang.Integer => Some(n.longValue())
        case _ => None
      }
    } catch { case _: java.util.concurrent.TimeoutException => None }
  }

  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          maxIterations: Int = 50, verbose: Boolean = false): DataFrame = {
    // symmetrize once; cache for reuse across iterations
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = vertices.select(col("id"), col("id").as("component"))
    var iter = 0
    var converged = false
    var prev: DataFrame = null
    while (!converged && iter < maxIterations) {
      // neighbor labels flow along edges; vertex keeps min(self, neighbors).
      // `own` marks the vertex's current label so the observed aggregate can
      // count label changes in the same pass.
      val msgs = sym
        .join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("component"), lit(false).as("own"))
      val merged = labels.select(col("id"), col("component"), lit(true).as("own"))
        .union(msgs)
        .groupBy("id")
        .agg(min(col("component")).as("component"),
          min(when(col("own"), col("component"))).as("prev_component"))
      val obs = Observation()
      val next = merged
        .observe(obs, sum(when(col("component") =!= col("prev_component"), 1L)
          .otherwise(0L)).as("changed"))
        .select(col("id"), col("component"))
        .localCheckpoint(eager = true) // the round's single job
      val changed = observedLong(obs, "changed").getOrElse {
        // listener raced or metric missing: one cheap scan of the
        // already-materialized round as fallback
        next.join(labels, Seq("id"))
          .filter(next("component") =!= labels("component")).limit(1).count()
      }
      if (prev != null) prev.unpersist()
      prev = next
      labels = next
      converged = changed == 0L
      iter += 1
      if (verbose) println(s"[cc] iteration $iter changed=$changed")
    }
    sym.unpersist()
    labels
  }
}
