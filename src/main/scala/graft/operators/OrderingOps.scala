package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.HashingEmbedder

/** Greedy nearest-neighbour ordering within clusters (SURVEY §2.6 W3;
  * reference `recap/article_ordering.py:14-33`): start from the most
  * central member (max summed cosine to the rest), then repeatedly append
  * the nearest neighbour of the last-placed member. Ties resolve to the
  * earlier member in the incoming order (Python `max` keeps the first
  * maximum).
  *
  * Inherently sequential per group -> `groupByKey.mapGroups`; cluster sizes
  * are bounded (reference splits at 20; our pipeline too), so per-group
  * state is tiny.
  */
object OrderingOps {

  /** Pure kernel: ids in canonical order + their vectors -> greedy order. */
  def orderCluster(ids: IndexedSeq[String], vecs: String => Array[Float]): IndexedSeq[String] = {
    if (ids.length <= 1) return ids
    val remaining = scala.collection.mutable.ArrayBuffer.from(ids)
    def centrality(i: String): Double =
      remaining.iterator.filter(_ != i).map(j => HashingEmbedder.cosine(vecs(i), vecs(j))).sum
    var best = remaining.head
    var bestScore = centrality(best)
    remaining.drop(1).foreach { c =>
      val s = centrality(c)
      if (s > bestScore) { best = c; bestScore = s } // strict: first max wins
    }
    val ordered = scala.collection.mutable.ArrayBuffer(best)
    remaining -= best
    while (remaining.nonEmpty) {
      val last = ordered.last
      var nxt = remaining.head
      var nxtScore = HashingEmbedder.cosine(vecs(last), vecs(nxt))
      remaining.drop(1).foreach { c =>
        val s = HashingEmbedder.cosine(vecs(last), vecs(c))
        if (s > nxtScore) { nxt = c; nxtScore = s }
      }
      ordered += nxt
      remaining -= nxt
    }
    ordered.toIndexedSeq
  }

  /** Spark surface: (cluster_id, url, text, rn) -> (cluster_id, url,
    * position). `rn` is the canonical in-cluster order (ties/start order).
    */
  def greedyOrder(spark: SparkSession, clustered: DataFrame): DataFrame = {
    import spark.implicits._
    clustered.select(col("cluster_id"), col("url"), col("text"), col("rn"))
      .as[(String, String, String, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (cid: String, it: Iterator[(String, String, String, Int)]) =>
        val members = it.toVector.sortBy(_._4)
        val vecs = members.map(m => m._2 -> HashingEmbedder.embed(m._3)).toMap
        val ordered = orderCluster(members.map(_._2), vecs)
        ordered.zipWithIndex.map { case (url, pos) => (cid, url, pos) }
      }
      .toDF("cluster_id", "url", "position")
  }
}
