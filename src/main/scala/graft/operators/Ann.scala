package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.MinHash
import graft.functions.Fns

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k (the exactness baseline — a broadcast of the
  * query side against a full scan of the corpus, no shuffle of the corpus)
  * and a random-hyperplane-LSH bucketed variant (the scale path: candidates
  * only from matching hash buckets across `nTables` independent tables —
  * corpus-size-independent probe cost per query).
  */
object Ann {

  /** Exact top-k neighbors for each query vector (queries small: broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Fns.cosineCol(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Random-hyperplane signature: bit i = sign(dot(vec, plane_i)), packed
    * per table into a Long bucket key. Deterministic planes from the seed.
    */
  private def hyperplaneBuckets(dim: Int, bitsPerTable: Int, nTables: Int, seed: Long) = {
    // planes(t)(b)(d): deterministic pseudo-gaussian via sum of mixed uniforms
    val planes = Array.tabulate(nTables, bitsPerTable, dim) { (t, b, d) =>
      val h = MinHash.mix64(seed ^ (t.toLong << 40) ^ (b.toLong << 20) ^ d)
      ((h >>> 11).toDouble * 1.1102230246251565e-16) * 2.0 - 1.0
    }
    udf { vec: Array[Float] =>
      if (vec == null) null
      else Array.tabulate(nTables) { t =>
        var key = 0L
        var b = 0
        while (b < bitsPerTable) {
          var dot = 0.0
          var d = 0
          while (d < vec.length) { dot += vec(d) * planes(t)(b)(d); d += 1 }
          if (dot >= 0) key |= (1L << b)
          b += 1
        }
        key | (t.toLong << 32) // disambiguate tables in one bucket space
      }
    }
  }

  /** Candidate (query_id, neighbor_id) pairs for [[lshTopK]]. The corpus
    * bucket rows carry ONLY (id, bucket) — the embedding does NOT ride the
    * nTables-way explosion (at 10^10 docs that is ~terabytes of avoidable
    * shuffle; same design as the dedup join, which shuffles an 8-byte
    * SimHash and joins the wide payload back post-gate). Vectors re-join
    * on the deduplicated candidate set only.
    */
  private[graft] def lshCandidateIds(corpus: DataFrame, queries: DataFrame,
                                     bitsPerTable: Int, nTables: Int, seed: Long,
                                     idCol: String, vecCol: String): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val bucketsOf = hyperplaneBuckets(dim, bitsPerTable, nTables, seed)
    val cB = corpus.select(col(idCol).as("neighbor_id"),
      explode(bucketsOf(col(vecCol))).as("bucket"))
    val qB = broadcast(queries.select(col(idCol).as("query_id"),
      explode(bucketsOf(col(vecCol))).as("bucket")))
    qB.join(cB, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
  }

  /** LSH ANN: candidates share a bucket in >= 1 of nTables tables; exact
    * cosine re-rank of candidates only. Embeddings join back onto the
    * deduplicated candidate pairs (query side broadcast), never through
    * the bucket explosion.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bitsPerTable: Int = 12, nTables: Int = 8, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val candIds = lshCandidateIds(corpus, queries, bitsPerTable, nTables, seed, idCol, vecCol)
    val cand = candIds
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))),
        Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec")),
        Seq("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand
      .withColumn("cosine", Fns.cosineCol(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Corpus x corpus approximate k-NN (every document is a query — the
    * all-pairs scale path, e.g. embedding-space near-dup mining over a
    * whole crawl). Same hyperplane-LSH bucketing as [[lshTopK]] but as a
    * bucket SELF-join: no broadcast side, shuffle keyed on the bucket, so
    * it partitions like the MinHash-LSH dedup join and inherits the same
    * skew defense — buckets above `maxBucketSize` (embedding-space
    * boilerplate clusters) are df-capped before the join.
    */
  def selfTopK(corpus: DataFrame, k: Int,
               bitsPerTable: Int = 12, nTables: Int = 8, seed: Long = 42L,
               maxBucketSize: Long = 2000,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val candIds = selfCandidateIds(corpus, bitsPerTable, nTables, seed,
      maxBucketSize, idCol, vecCol)
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cand = candIds
      .join(vecs.withColumnsRenamed(Map("id" -> "query_id", "vec" -> "qvec")),
        Seq("query_id"))
      .join(vecs.withColumnsRenamed(Map("id" -> "neighbor_id", "vec" -> "nvec")),
        Seq("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand
      .withColumn("cosine", Fns.cosineCol(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Candidate pairs for [[selfTopK]]: bucket rows carry ONLY (id, bucket)
    * — each ~1.5 KB embedding would otherwise be shuffled nTables times
    * through the explosion (~terabytes at crawl scale). Embeddings join
    * back onto the deduplicated candidate pairs: O(candidates + corpus)
    * shuffle instead of O(corpus x nTables) x vector width.
    */
  private[graft] def selfCandidateIds(corpus: DataFrame,
                                      bitsPerTable: Int, nTables: Int, seed: Long,
                                      maxBucketSize: Long,
                                      idCol: String, vecCol: String): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val bucketsOf = hyperplaneBuckets(dim, bitsPerTable, nTables, seed)
    val bucketed0 = corpus.select(col(idCol).as("id"),
      explode(bucketsOf(col(vecCol))).as("bucket"))
    val bucketed =
      if (maxBucketSize > 0) SkewOps.capHotBuckets(bucketed0, Seq(col("bucket")), maxBucketSize)
      else bucketed0
    bucketed.alias("a").join(bucketed.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
  }
}
