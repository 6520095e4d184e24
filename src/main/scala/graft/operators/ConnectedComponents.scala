package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list, as iterative
  * DataFrame min-label propagation (no GraphFrames, no RDDs).
  *
  * Replaces the reference's in-memory BFS (`recap/dedup/cluster.py:73-91`).
  * Labels are the vertex keys themselves (here: urls — unique by input
  * contract, so collision-free at any scale); each iteration every vertex
  * takes the min of its own label and its neighbors' labels. Converges in
  * O(max component diameter) rounds — dedup components are near-cliques
  * (verified-pair subgraphs of near-identical docs), so this is 2-4 rounds
  * in practice. `localCheckpoint` truncates lineage each round; convergence
  * is detected by an aggregate change-count (no driver-side collect of data).
  *
  * @param edges DataFrame with columns (src, dst) — one row per undirected
  *              edge, either direction.
  * @param vertices DataFrame with column (id) — all vertices (isolated ones
  *                 come out as their own singleton component).
  * @return DataFrame (id, component) where component = min vertex key of the
  *         component under the key's natural ordering.
  */
object ConnectedComponents {

  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          maxIterations: Int = 50, verbose: Boolean = false): DataFrame = {
    // symmetrize once; cache for reuse across iterations
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint(eager = true)

    // convergence: order-insensitive fingerprint of the full label
    // assignment — one cheap aggregate per round instead of a join
    def fingerprint(df: DataFrame): Long = {
      val r = df.agg(expr("bit_xor(xxhash64(id, component))")).first()
      if (r.isNullAt(0)) 0L else r.getLong(0) // null = empty vertex set
    }

    var prevFp = fingerprint(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      // neighbor labels flow along edges; vertex keeps min(self, neighbors)
      val msgs = sym
        .join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(msgs)
        .groupBy("id")
        .agg(min("component").as("component"))
        .localCheckpoint(eager = true)
      val fp = fingerprint(next)
      labels = next
      converged = fp == prevFp
      prevFp = fp
      iter += 1
      if (verbose) println(s"[cc] iteration $iter converged=$converged")
    }
    sym.unpersist()
    labels
  }
}
