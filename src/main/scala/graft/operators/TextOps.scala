package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** Document-table operators for the training-data pipeline: exact dedup,
  * language id, quality scoring, token counting, fingerprinting.
  * All are thin declarative plans over a `documents(doc_id, text, ...)`
  * DataFrame — filters/projections push to the parquet scan; the single
  * shuffle per op is the groupBy/window on its key.
  */
object TextOps {

  /** Exact duplicate grouping by content hash (map-side partial agg via
    * window over the hash). Keeper = smallest doc_id in the hash group —
    * deterministic at any scale.
    */
  def exactDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("content_md5"))
    docs
      .withColumn("content_md5", md5(col(textCol)))
      .withColumn("keeper_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col(idCol), col("content_md5"), col("keeper_id"), col("group_size"),
        (col(idCol) === col("keeper_id")).as("is_keeper"))
  }

  /** Language id as a pure column expression (no UDF; see Fns). */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      Fns.detectLanguage(col(textCol), lit("")).as("lang_detected"))

  /** SQL-expressible quality features (chars, tokens, alpha chars, mean
    * token length in basis points) — the oracle-checkable subset of
    * TextStats.quality.
    */
  def quality(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = trim(col(textCol))
    val nChars = length(t)
    val nTokens = when(length(t) === 0, 0).otherwise(size(split(t, "\\s+")))
    val nSpaces = nChars - length(regexp_replace(t, " ", ""))
    // bigint to match DuckDB's length()/len() result types exactly
    docs.select(
      col(idCol),
      nChars.cast("bigint").as("n_chars"),
      nTokens.cast("bigint").as("n_tokens"),
      nSpaces.cast("bigint").as("n_spaces"),
      // mean token length in 1/100 chars, integer — exact cross-engine
      when(nTokens === 0, 0L)
        .otherwise(round((nChars - nSpaces).cast("double") * 100 / nTokens).cast("bigint"))
        .as("mean_token_len_c"))
  }

  /** Full kernel-side quality + token stats (UDF; not SQL-expressible). */
  def qualityFull(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      Fns.wsTokensUdf(col(textCol)).as("ws_tokens"),
      Fns.bpeTokensUdf(col(textCol)).as("bpeish_tokens"),
      Fns.qualityUdf(col(textCol)).as("q"))
      .select(col(idCol), col("ws_tokens"), col("bpeish_tokens"),
        col("q.nChars").as("n_chars"), col("q.punctRatio").as("punct_ratio"),
        col("q.stopwordRatio").as("stopword_ratio"), col("q.score").as("quality_score"))

  /** Rolling-hash document fingerprints (content-defined, ws/case-insensitive). */
  def fingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      Fns.fingerprintUdf(col(textCol)).as("fingerprint"),
      Fns.winnowUdf(col(textCol), lit(7), lit(4)).as("winnow_fps"))

  /** Word-n-gram Jaccard near-dup pairs: explode distinct word n-grams,
    * self-equi-join on the n-gram hash, count intersections, compute
    * Jaccard >= minJaccard. The n-gram join IS the candidate generator
    * (no all-pairs); skew-prone hot shingles (boilerplate) are dropped via
    * a document-frequency cap — standard at web scale.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
                        maxShingleDf: Int = 100,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        explode(array_distinct(transform(
          filter(split(lower(trim(col(textCol))), "\\s+"),
            (_, i) => i <= size(split(lower(trim(col(textCol))), "\\s+")) - n),
          (_, i) => xxhash64(concat_ws(" ",
            slice(split(lower(trim(col(textCol))), "\\s+"), i + 1, lit(n)))))))
        .as("gram"))
    // df-cap disabled (maxShingleDf == Int.MaxValue): skip the window
    // outright — it is a full shuffle+sort of the exploded gram table that
    // the `df <= MaxValue` filter would keep verbatim (round-6; the cap
    // path itself is unchanged and stays kernel-tested in OpsSpec)
    val gramsSized =
      if (maxShingleDf == Int.MaxValue) grams
      else grams
        .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
        .filter(col("df") <= maxShingleDf)
        .drop("df")
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val inter = gramsSized.as("a").join(gramsSized.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n_grams" -> "grams_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "n_grams" -> "grams_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("grams_a") + col("grams_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_inter", "grams_a", "grams_b", "jaccard")
  }
}
