package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Cost model: two jobs per round, both cheap. Job 1 is the round itself
  * (join + groupBy, materialized by `localCheckpoint` which also truncates
  * lineage so plan size stays constant). The vertex's previous label rides
  * the aggregation as a second min(), so job 2 — the convergence check — is
  * a `limit(1)` existence scan of the already-checkpointed round: it
  * early-exits at the first changed vertex and touches only in-memory
  * blocks. (A `Dataset.observe`-based single-job variant was measured and
  * rejected: observed metrics arrive via the async listener bus, and under
  * high-parallelism AQE load the completion event can be delayed/dropped —
  * each round then stalls on a timeout, turning CC into the pipeline's
  * scaling bottleneck.)
  *
  * @param edges DataFrame with columns (src, dst) — one row per undirected
  *              edge, either direction.
  * @param vertices DataFrame with column (id) — all vertices (isolated ones
  *                 come out as their own singleton component). Need NOT be
  *                 distinct: it only feeds round 1's aggregation, where
  *                 duplicates are merged by the groupBy for free (rounds
  *                 2+ join against groupBy outputs, which are distinct by
  *                 construction — the d² message blow-up a duplicated
  *                 vertex used to cause cannot occur).
  * @return DataFrame (id, component) where component = min vertex key of the
  *         component under the key's natural ordering.
  */
object ConnectedComponents {

  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
          maxIterations: Int = 50, verbose: Boolean = false): DataFrame = {
    // symmetrize once; cache for reuse across iterations. NOT deduplicated:
    // a duplicate edge only sends a duplicate message into a min()
    // aggregation — harmless — while a distinct() here costs a full extra
    // shuffle of the edge list every run (measured as a fixed ~2 s barrier
    // at bench scale, pure overhead at any scale).
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = vertices.select(col("id"), col("id").as("component"))
    var iter = 0
    var converged = false
    var prevChk: DataFrame = null
    while (!converged && iter < maxIterations) {
      // neighbor labels flow along edges; vertex keeps min(self, neighbors).
      // `own` marks the vertex's current label so the same aggregation also
      // yields the previous label for the convergence check.
      //
      // Round 1 fuses a SECOND hop into the same checkpointed job: dedup
      // components are near-cliques, so two hops usually reach the
      // component minimum outright — one fewer round barrier and one fewer
      // convergence-check job than single-hop (the round-1 check is
      // skipped regardless, so the fused hop needs no prev tracking).
      //
      // Hop 1 needs NO join: the initial label of a vertex is its own id,
      // so the message dst receives from src is just src itself —
      // `sym.select(dst, src)` IS the hop-1 message stream. The groupBy
      // both aggregates and deduplicates, which also makes a distinct()
      // on the caller's vertex list unnecessary (measured: the old
      // join-based hop 1 + upstream vertices.distinct() put two extra
      // full-edge-list exchanges inside round 1 — at the 2M-doc bench
      // round 1 was 18.7 s of the ~24 s CC total at 32 cores).
      val base =
        if (iter == 0) {
          sym.select(col("dst").as("id"), col("src").as("component"))
            .union(labels)
            .groupBy("id").agg(min(col("component")).as("component"))
        } else labels
      val msgs = sym
        .join(base, sym("src") === base("id"))
        .select(sym("dst").as("id"), col("component"), lit(false).as("own"))
      val t0 = System.nanoTime()
      val next = base.select(col("id"), col("component"), lit(true).as("own"))
        .union(msgs)
        .groupBy("id")
        .agg(min(col("component")).as("component"),
          min(when(col("own"), col("component"))).as("prev_component"))
        .localCheckpoint(eager = true) // job 1: the round
      val t1 = System.nanoTime()
      // job 2: early-exit existence scan over the in-memory checkpoint.
      // Skipped on round 1 — any non-empty edge set changes a label there
      // (the greater endpoint of some edge adopts the smaller label), so
      // the check can only say "changed"; an empty input just pays one
      // extra (empty) round.
      // null-safe comparison: an id that appears only in `edges` (not in
      // `vertices`) has a null prev_component on its first appearance; a
      // plain =!= evaluates to null there and the filter would drop the
      // row — declaring convergence while labels still propagate.
      val changed = iter == 0 ||
        next.filter(!(col("component") <=> col("prev_component")))
          .limit(1).count() > 0
      val t2 = System.nanoTime()
      if (prevChk != null) prevChk.unpersist()
      prevChk = next
      labels = next.select(col("id"), col("component"))
      converged = !changed
      iter += 1
      if (verbose) println(f"[cc] iteration $iter changed=$changed round=${(t1 - t0) / 1e9}%.2fs check=${(t2 - t1) / 1e9}%.2fs")
    }
    sym.unpersist()
    labels
  }
}
