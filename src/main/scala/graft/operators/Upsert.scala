package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Upsert sink semantics (SURVEY §2.1 S6 + §2.4 J2; reference
  * `ingestion/repository.py:270-305, 348-365, 568-613`):
  *
  *   - match incoming rows to existing by (source_name, external_id),
  *     falling back to (source_name, url_canonical)
  *   - matched + any tracked field changed  -> UPDATED, keeping the
  *     existing row's `article_id` and `ingested_at`
  *   - matched + nothing changed            -> SKIPPED (existing row kept)
  *   - unmatched                            -> INSERTED with a fresh
  *     deterministic id and `ingested_at = runTs`
  *
  * On Iceberg this is `MERGE INTO ... WHEN MATCHED ... WHEN NOT MATCHED`;
  * here it is the engine-level join formulation that a MERGE compiles to —
  * two left joins (primary key, then fallback key on the remainder) plus a
  * change-detection predicate, all shuffle-partitioned on the match keys.
  *
  * `article_id` for inserts is sha1(source_name, external_id, runTs) —
  * deterministic (the reference uses uuid4; determinism is required for our
  * idempotent re-runs and costs nothing).
  */
object Upsert {

  /** Tracked fields for change detection (`_article_changed`). */
  val TrackedFields: Seq[String] = Seq(
    "url", "url_canonical", "url_hash", "title", "source_domain",
    "published_at", "language_detected", "content_raw", "summary_raw",
    "is_full_content", "clean_text", "clean_text_chars", "is_truncated")

  /** existing: Article-shaped (article_id, ingested_at, source_name,
    * external_id, url_canonical, tracked fields...);
    * incoming: same minus article_id/ingested_at.
    * Returns the merged table plus an `action` column
    * (INSERTED/UPDATED/SKIPPED/KEPT — KEPT = existing row untouched by this
    * batch).
    */
  def upsert(spark: SparkSession, existing: DataFrame, incoming: DataFrame,
             runTs: java.sql.Timestamp): DataFrame = {
    val cols = incoming.columns.toSeq
    require(TrackedFields.forall(cols.contains), s"incoming missing tracked fields")

    val ex = existing.select(
      col("article_id"), col("ingested_at"),
      struct(cols.map(col): _*).as("ex"))
    val in = incoming.select(struct(cols.map(col): _*).as("in"))

    // pass 1: primary key (source_name, external_id)
    val p1 = in.join(ex,
      col("in.source_name") === col("ex.source_name") &&
        col("in.external_id") === col("ex.external_id"), "left")
    val matched1 = p1.filter(col("article_id").isNotNull)
    val rest = p1.filter(col("article_id").isNull).select(col("in"))

    // pass 2: fallback key (source_name, url_canonical) on the remainder
    val p2 = rest.join(ex,
      col("in.source_name") === col("ex.source_name") &&
        col("in.url_canonical") === col("ex.url_canonical"), "left")
    val matched2 = p2.filter(col("article_id").isNotNull)
    val inserts = p2.filter(col("article_id").isNull).select(col("in"))

    val changed = TrackedFields
      .map(f => !(col(s"in.$f") <=> col(s"ex.$f")))
      .reduce(_ || _)

    val updatedOrSkipped = matched1.union(matched2)
      .withColumn("action", when(changed, "UPDATED").otherwise("SKIPPED"))
      .select(
        col("article_id"),
        col("ingested_at"),
        when(col("action") === "UPDATED", col("in")).otherwise(col("ex")).as("row"),
        col("action"))

    val inserted = inserts
      .withColumn("article_id",
        sha1(concat_ws("|", col("in.source_name"), col("in.external_id"),
          lit(runTs.toString))))
      .withColumn("ingested_at", lit(runTs))
      .select(col("article_id"), col("ingested_at"), col("in").as("row"),
        lit("INSERTED").as("action"))

    // existing rows not touched by this batch
    val touched = updatedOrSkipped.select(col("article_id"))
    val kept = ex.join(touched, Seq("article_id"), "left_anti")
      .select(col("article_id"), col("ingested_at"), col("ex").as("row"),
        lit("KEPT").as("action"))

    updatedOrSkipped.union(inserted).union(kept)
      .select(Seq(col("article_id"), col("ingested_at"), col("action")) ++
        cols.map(f => col(s"row.$f").as(f)): _*)
  }
}
