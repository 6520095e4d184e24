package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.Fns

/** The flagship near-duplicate detection + clustering pipeline.
  *
  * Semantics contract (reference parity): two documents are duplicates iff
  * `cosine(HashingEmbedder(text_a), HashingEmbedder(text_b)) >= threshold`
  * (default 0.90), clusters are connected components of that edge relation,
  * components of size < 2 are dropped, components larger than `maxGroupSize`
  * (20) are split into deterministic-order chunks — exactly the reference's
  * `group_similar` (`/root/reference/src/news_recap/recap/dedup/cluster.py:13-50`)
  * with the canonical document order pinned to (warc_ts desc, url asc), the
  * retrieval order of `ingestion/repository.py:548`.
  *
  * Scale design (this is the O(n²)→O(n) rewrite, SURVEY §2.4 J1):
  *   1. one pass per doc computes MinHash signature + SimHash + embedding
  *   2. LSH banding turns the all-pairs θ-join into an equi-self-join on
  *      (band, bucket) — shuffle-partitioned, AQE-skew-handled
  *   3. candidates are verified with the exact cosine predicate as a
  *      codegen'd column expression (no UDF in the join hot path)
  *   4. connected components via iterative min-label propagation
  *   5. >20 split + keeper selection as window functions per component
  *
  * Banding default (128 hashes, 32 bands × 4 rows) puts the LSH S-curve
  * 50%-collision point at Jaccard ≈ (1/32)^(1/4) ≈ 0.42 — far below the
  * shingle-Jaccard that corresponds to cosine 0.90 on 3-gram vectors — so
  * candidate recall at the contract threshold is ~1.0 (measured in
  * DedupParitySpec; BASELINE target ≥ 0.99).
  */
final case class DedupConfig(
    shingleK: Int = 3,
    numHashes: Int = 128,
    bands: Int = 32,
    threshold: Double = 0.90,
    maxGroupSize: Int = 20,
    seed: Long = 42L,
    /** SimHash hamming pre-gate on LSH candidates, applied before the
      * expensive embedding join. Observed true-edge (cosine>=0.90) hamming
      * tops out at 17/64 on synthetic corpora; 26 leaves a wide margin while
      * rejecting ~9x the random-pair mass (random hamming ~ N(32, 4)).
      * Set < 0 to disable.
      */
    simhashPregateMaxHamming: Int = 26)

object DedupPipeline {

  /** 128-bit numeric surrogate key for a url. Every downstream join/shuffle
    * (LSH self-join, verify, CC) moves 16 bytes instead of a ~60-byte url
    * string; collision probability at the 10^12-doc design point is
    * ~1e-15. The url is joined back only at the final assignment step.
    */
  private def uidOf(url: Column): Column =
    struct(xxhash64(url).as("h1"), xxhash64(url, lit(0x9E3779B9L)).as("h2"))

  /** Per-doc signatures: uid, url, warc_ts, nChars, minhash, simhash, vec.
    * One UDF pass for shingle-derived values + one for the embedding.
    */
  def signatures(pages: DataFrame, cfg: DedupConfig): DataFrame = {
    pages
      .select(col("url"), col("warc_ts"), col("text"))
      .withColumn("sig", Fns.signaturesUdf(cfg.shingleK, cfg.numHashes, cfg.seed)(col("text")))
      .withColumn("vec", Fns.embedUdf(col("text")))
      .select(
        uidOf(col("url")).as("uid"),
        col("url"), col("warc_ts"),
        length(col("text")).as("n_chars"),
        col("sig.minhash").as("minhash"),
        col("sig.simhash").as("simhash"),
        col("sig.nShingles").as("n_shingles"),
        col("vec"))
  }

  /** Candidate pairs from LSH banding: (url_a, url_b, simhash_hamming) with
    * url_a < url_b. The 8-byte SimHash rides along in the bucket rows so the
    * hamming pre-gate runs inside this join — before any wide payload
    * (signature/embedding) is shuffled for a candidate that a cheap bit
    * count can reject.
    */
  def candidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val buckets = sigs
      .filter(col("minhash").isNotNull)
      .select(col("uid"), col("simhash"),
        posexplode(Fns.lshBucketsUdf(cfg.bands)(col("minhash"))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val a = buckets.alias("a")
    val b = buckets.alias("b")
    val joined = a.join(b,
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.uid") < col("b.uid"))
      .select(col("a.uid").as("uid_a"), col("b.uid").as("uid_b"),
        Fns.hammingCol(col("a.simhash"), col("b.simhash")).as("simhash_hamming"))
    val gated =
      if (cfg.simhashPregateMaxHamming >= 0)
        joined.filter(col("simhash_hamming") <= cfg.simhashPregateMaxHamming)
      else joined
    gated.dropDuplicates("uid_a", "uid_b")
  }

  /** Verified duplicate edges: exact reference cosine >= threshold. Only the
    * embedding column is shuffled into this join (the hot path); pass
    * `diagnostics = true` to also carry MinHash signatures and emit the
    * estimated-Jaccard column.
    */
  def verifiedEdges(sigs: DataFrame, cand: DataFrame, cfg: DedupConfig,
                    diagnostics: Boolean = false): DataFrame = {
    val lhsCols = Seq(col("uid").as("uid_a"), col("vec").as("vec_a")) ++
      (if (diagnostics) Seq(col("url").as("url_a"), col("minhash").as("mh_a")) else Nil)
    val rhsCols = Seq(col("uid").as("uid_b"), col("vec").as("vec_b")) ++
      (if (diagnostics) Seq(col("url").as("url_b"), col("minhash").as("mh_b")) else Nil)
    val verified = cand
      .join(sigs.select(lhsCols: _*), "uid_a")
      .join(sigs.select(rhsCols: _*), "uid_b")
      .withColumn("cosine", Fns.cosineCol(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= cfg.threshold)
    val base = Seq(col("uid_a"), col("uid_b"), col("cosine"), col("simhash_hamming"))
    if (diagnostics)
      verified.select(base ++ Seq(col("url_a"), col("url_b"),
        Fns.estJaccardCol(col("mh_a"), col("mh_b")).as("est_jaccard")): _*)
    else verified.select(base: _*)
  }

  /** Full run: pages -> cluster assignments.
    *
    * Output columns: url, warc_ts, n_chars, component (min url of the
    * pre-split component), cluster_id (sha1 of component key + chunk index),
    * cluster_size, is_keeper. Docs not in any cluster (singletons) are
    * omitted — the reference returns only groups of >= 2.
    */
  def run(spark: SparkSession, pages: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val sigs = signatures(pages, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val cand = candidates(sigs, cfg)
    val edges = verifiedEdges(sigs, cand, cfg)
      .select(col("uid_a").as("src"), col("uid_b").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Only vertices that appear in at least one edge can be in a >=2
    // component; everything else is a singleton and drops out — keeps the
    // CC working set at the number of *duplicated* docs, not corpus size.
    val vertices = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()

    val comps = ConnectedComponents.run(spark, vertices, edges)

    val assigned = comps
      .join(sigs.select(col("uid"), col("url"), col("warc_ts"), col("n_chars")),
        comps("id") === col("uid"))
      .select(col("url"), col("warc_ts"), col("n_chars"), col("component"))

    val out = splitAndSelectKeepers(assigned, cfg)
    edges.unpersist()
    sigs.unpersist()
    out
  }

  /** The reference's post-CC steps: drop <2 components, split >maxGroupSize
    * components into canonical-order chunks of <= maxGroupSize, drop <2
    * chunks, pick the keeper (max text length, earliest canonical order on
    * ties — Python `max` keeps the first maximum).
    */
  def splitAndSelectKeepers(assigned: DataFrame, cfg: DedupConfig): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val compW = Window.partitionBy(col("component"))
    val canonical = compW.orderBy(col("warc_ts").desc, col("url").asc)
    val withRn = assigned
      .withColumn("rn", row_number().over(canonical))
      .withColumn("comp_size", count(lit(1)).over(compW))
      // human-meaningful deterministic component key: min url of the component
      .withColumn("component_key", min(col("url")).over(compW))
      .filter(col("comp_size") >= 2)
      .withColumn("chunk", ((col("rn") - 1) / cfg.maxGroupSize).cast("int"))

    val chunkW = Window.partitionBy(col("component"), col("chunk"))
    val keeperW = chunkW.orderBy(col("n_chars").desc, col("rn").asc)
    withRn
      .withColumn("cluster_size", count(lit(1)).over(chunkW))
      .filter(col("cluster_size") >= 2)
      .withColumn("is_keeper", row_number().over(keeperW) === 1)
      .withColumn("cluster_id",
        sha1(concat_ws("#", col("component_key"), col("chunk"))))
      .select(col("url"), col("warc_ts"), col("n_chars"),
        col("component_key").as("component"), col("chunk"),
        col("cluster_id"), col("cluster_size"), col("is_keeper"))
  }
}
