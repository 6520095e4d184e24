package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns
import graft.operators._
import graft.sources.PagesGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is a declarative DataFrame plan (filters/projections push to
  * the parquet scan; joins broadcast when a side is small). Money/value
  * aggregates are emitted as integer basis points (`cast(round(x*scale) as
  * bigint)`) so the DuckDB oracle comparison is exact, not float-fuzzy.
  */
object SparkEntry {

  private def ld(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `cast(round(c * scale) as bigint)` — exact cross-engine integer money. */
  private def bp(c: org.apache.spark.sql.Column, scale: Int) =
    round(c * scale).cast("bigint")

  // ------------------------------------------------------------------
  // Oracle aux tables: the dedup/multimodal corpora are generated
  // in-session (deterministic from seed), so the DuckDB oracle can only
  // verify them if the INPUTS are also on disk. Each query writes its
  // generated input to a fixed absolute path once per JVM; the oracle SQL
  // reads it back via read_parquet() and recomputes the result
  // independently (all-pairs exact cosine, recursive-CTE connected
  // components, header-math media features). Spark and DuckDB therefore
  // consume byte-identical f32 embeddings / media bytes.
  // ------------------------------------------------------------------
  private val AuxDir = "/root/repo/target/verify_aux"
  @volatile private var dedupAuxDone = false
  @volatile private var mediaAuxDone = false

  /** Bump whenever PagesGen / signatures / Multimodal GENERATION semantics
    * change: the on-disk marker invalidates stale aux parquet written by
    * older code. With a fresh marker the export is skipped entirely, so
    * repeat invocations (and the bench's timed `p_dedup_clusters` run)
    * don't pay the write (BENCH_r03 regression: the export inside the
    * timed query cost ~2 s).
    */
  private val AuxVersion = "r4-1"

  private def auxFresh(name: String): Boolean = {
    val m = java.nio.file.Paths.get(s"$AuxDir/$name.marker")
    java.nio.file.Files.exists(m) &&
      java.nio.file.Files.readString(m) == AuxVersion &&
      new java.io.File(s"$AuxDir/$name.parquet").exists()
  }

  private def markAux(name: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(AuxDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$AuxDir/$name.marker"), AuxVersion): Unit
  }

  /** Materialize both oracle aux tables (no-op when fresh on disk). The
    * bench calls this BEFORE its timed query loop so the export cost never
    * lands inside a timed query.
    */
  def ensureAux(s: SparkSession): Unit = { dedupAuxPages(s); mediaAux(s); () }

  /** Deterministic 3k-doc dedup corpus; side-effect-writes
    * (url, warc_ts, n_chars, simhash, vec) for the DuckDB oracle.
    */
  private def dedupAuxPages(s: SparkSession): DataFrame = {
    val pages = PagesGen.generate(s, nDocs = 3000, nDomains = 100, seed = 42L)
    if (!dedupAuxDone) synchronized { if (!dedupAuxDone) {
      if (!auxFresh("dedup_corpus")) {
        DedupPipeline.signatures(pages, DedupConfig())
          .select(col("url"), col("warc_ts"), col("n_chars"), col("simhash"),
            Fns.sparseToDenseUdf(col("svec")).as("vec")) // exact dense form for DuckDB
          .coalesce(4).write.mode("overwrite").parquet(s"$AuxDir/dedup_corpus.parquet")
        markAux("dedup_corpus")
      }
      dedupAuxDone = true
    } }
    pages
  }

  /** Deterministic 200-row media table; side-effect-writes the raw bytes
    * for the DuckDB oracle (which re-derives dims/duration from the BMP/WAV
    * headers by pure byte arithmetic).
    */
  private def mediaAux(s: SparkSession): DataFrame = {
    val media = Multimodal.generateMedia(s, 200, seed = 42L)
    if (!mediaAuxDone) synchronized { if (!mediaAuxDone) {
      if (!auxFresh("media")) {
        media.select("media_id", "kind", "bytes")
          .coalesce(2).write.mode("overwrite").parquet(s"$AuxDir/media.parquet")
        markAux("media")
      }
      mediaAuxDone = true
    } }
    media
  }

  /** Flagship: full near-dup clustering of a deterministic synthetic pages
    * corpus (generated in-session; sf0.001-sized). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesGen.generate(spark, nDocs = 1500, nDomains = 100, seed = 42L)
    DedupPipeline.run(spark, pages).orderBy("cluster_id", "url")
  }

  // ------------------------------------------------------------------
  // Queries. Keys map 1:1 to SURVEY.md §2 operators (noted inline).
  // ------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A5-style partial+final hash agg (SURVEY §2.5 A5) + exact money math
    "q1_pricing_summary" -> ((s, dir) => {
      ld(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          sum(bp(col("l_extendedprice"), 100)).as("sum_price_c"),
          sum(bp(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)).as("revenue_bp"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // 3-way join + top-k (SURVEY §2.4 J3, §2.6 W1); customer side broadcast
    "q3_top_revenue" -> ((s, dir) => {
      val c = ld(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = ld(s, dir, "orders")
      val l = ld(s, dir, "lineitem")
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(bp(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)).as("revenue_bp"))
        .orderBy(col("revenue_bp").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // 6-way join, dims broadcast (SURVEY §2.4)
    "q5_nation_revenue" -> ((s, dir) => {
      val c = ld(s, dir, "customer")
      val o = ld(s, dir, "orders")
      val l = ld(s, dir, "lineitem")
      val su = ld(s, dir, "supplier")
      val n = ld(s, dir, "nation")
      val r = ld(s, dir, "region").filter(col("r_name") === "EUROPE")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(bp(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)).as("revenue_bp"))
        .orderBy(col("revenue_bp").desc, col("n_name").asc)
    }),

    // left-semi existence join (SURVEY §2.4 J2/J6)
    "q_exists_bigqty" -> ((s, dir) => {
      val o = ld(s, dir, "orders")
      val big = ld(s, dir, "lineitem").filter(col("l_quantity") >= 48)
        .select("l_orderkey")
      o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // left-anti join (SURVEY §2.4 J6 resume primitive)
    "q_cust_no_urgent" -> ((s, dir) => {
      val c = ld(s, dir, "customer")
      val o = ld(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),

    // per-group top-1 window (SURVEY §2.5 A2 keeper pattern)
    "q_top_order_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      ld(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          bp(col("o_totalprice"), 100).as("price_c"))
        .orderBy("o_custkey")
    }),

    // running-total window (SURVEY §2.6)
    "q_daily_running" -> ((s, dir) => {
      // day as string: immune to timestamp-unit drift between engines
      val daily = ld(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("n"))
      daily.withColumn("running",
          sum(col("n")).over(Window.orderBy(col("d"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("d")
    }),

    // interval/gap join via lag (SURVEY §2.4 J5)
    "q_session_gaps" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val us = unix_micros(col("ts").cast("timestamp")) // ts is NTZ; session tz is UTC
      ld(s, dir, "events")
        .withColumn("gap_us", us - lag(us, 1).over(w))
        .filter(col("gap_us") > 1800L * 1000000L)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_gaps"))
        .orderBy("user_id")
    }),

    // top-k aggregation (SURVEY §2.5 A6)
    "q_event_type_topk" -> ((s, dir) => {
      ld(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(bp(col("value"), 100)).as("sum_value_c"))
        .orderBy(col("n").desc, col("event_type").asc)
        .limit(3)
    }),

    // time-bucketed rollup (SURVEY §2.9 batch-incremental window)
    "q_hourly_values" -> ((s, dir) => {
      ld(s, dir, "events")
        .groupBy(date_format(date_trunc("HOUR", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"))
        .agg(count(lit(1)).as("n"), sum(bp(col("value"), 100)).as("sum_value_c"))
        .orderBy("h")
    }),

    // last-wins dedup-on-write (SURVEY §2.1 S6 upsert sink semantics)
    "q_lineitem_lastwins" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_shipdate").desc, col("l_linenumber").desc, col("l_returnflag").desc)
      ld(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // exact dedup by content hash (training-data op; SURVEY §2.5 A3 analog)
    "d_exact_dedup" -> ((s, dir) =>
      TextOps.exactDedup(ld(s, dir, "documents")).orderBy("doc_id")),

    // language id as pure column expr (SURVEY §2.2 P6)
    "d_langid_counts" -> ((s, dir) =>
      TextOps.langId(ld(s, dir, "documents"))
        .groupBy(col("lang_detected")).agg(count(lit(1)).as("n"))
        .orderBy("lang_detected")),

    // quality scoring, SQL-expressible subset (SURVEY §2.2 P12)
    "d_quality" -> ((s, dir) =>
      TextOps.quality(ld(s, dir, "documents")).orderBy("doc_id")),

    // kernel-side quality + token counting (rows-only; UDF surface)
    "d_quality_full" -> ((s, dir) =>
      TextOps.qualityFull(ld(s, dir, "documents")).orderBy("doc_id")
        .select(col("doc_id"), col("ws_tokens"), col("bpeish_tokens"), col("n_chars"),
          bp(col("quality_score"), 10000).as("quality_bp"))),

    // document fingerprinting (rows-only; UDF surface)
    "d_fingerprints" -> ((s, dir) =>
      TextOps.fingerprints(ld(s, dir, "documents"))
        .select(col("doc_id"), col("fingerprint"), size(col("winnow_fps")).as("n_winnow"))
        .orderBy("doc_id")),

    // brute-force cosine top-k over embeddings (training-data op)
    "e_cosine_topk" -> ((s, dir) => {
      val emb = ld(s, dir, "embeddings")
      Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("bigint").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // corpus x corpus approximate k-NN via the LSH bucket self-join
    // (rows-only; planted-twin recall tested in Round2Spec)
    "e_ann_self" -> ((s, dir) =>
      Ann.selfTopK(ld(s, dir, "embeddings"), k = 3)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("bigint").as("rank"))
        .orderBy("query_id", "rank")),

    // LSH-bucketed ANN (scale path; rows-only, recall-tested in AnnSpec)
    "e_ann_topk" -> ((s, dir) => {
      val emb = ld(s, dir, "embeddings")
      Ann.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("bigint").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // ORACLE-CHECKABLE recall for the approximate path. The sf embeddings
    // table has no close pairs (best all-pairs cosine ~0.51 at sf0.01), so
    // an honest recall-1.0 assertion is only meaningful on a corpus with
    // true near neighbors: the aux dedup corpus (real near-dup families at
    // cosine >= 0.90, vectors on disk for DuckDB). Queries = the first 20
    // docs (by url) whose exact top-3 are ALL >= 0.90; Spark emits how many
    // of the brute-force top-3 the hyperplane-LSH path recovered, DuckDB
    // independently recomputes the brute-force sets and asserts n_hit = 3.
    // A hash mismatch means the approximate structure lost a true neighbor.
    "e_ann_recall" -> ((s, _) => {
      val pages = dedupAuxPages(s)
      val vecs = DedupPipeline.signatures(pages, DedupConfig())
        .select(col("url").as("vec_id"),
          Fns.sparseToDenseUdf(col("svec")).as("embedding"))
        .persist()
      vecs.count() // materialize before the multi-consumer fan-out
      val top3 = Ann.bruteForceTopK(vecs, vecs, k = 3)
      val eligible = top3.groupBy(col("query_id"))
        .agg(min(col("cosine")).as("c3"), count(lit(1)).as("k"))
        .filter(col("k") === 3 && col("c3") >= 0.90)
        .select(col("query_id")).orderBy("query_id").limit(20)
      val queries = vecs.join(
        eligible.withColumnRenamed("query_id", "vec_id"), Seq("vec_id"))
      // 6-bit x 16-table hyperplane LSH: per-neighbor miss probability at
      // cosine 0.90 is (1 - 0.857^6)^16 ~ 3e-4; deterministic planes from
      // the seed, so the measured recall is a fixed property of the fixture
      val approx = Ann.lshTopK(vecs, queries, k = 3,
          bitsPerTable = 6, nTables = 16)
        .select(col("query_id"), col("neighbor_id"))
      val hits = top3.select(col("query_id"), col("neighbor_id"))
        .join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      eligible.join(hits, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)) * 10000.0 / 3)
            .cast("bigint").as("recall_bp"))
        .orderBy("query_id")
    }),

    // ORACLE-CHECKABLE recall for the corpus x corpus self path (same
    // eligible-query construction and n_hit=3 assertion as e_ann_recall,
    // same 6-bit x 16-table planes), but the approximate structure under
    // test is the bucket SELF-join incl. its df-cap (Ann.selfTopK) instead
    // of the broadcast query-vs-corpus probe. Together the two rows cover
    // both ANN topologies with an independent DuckDB brute-force oracle.
    "e_ann_self_recall" -> ((s, _) => {
      val pages = dedupAuxPages(s)
      val vecs = DedupPipeline.signatures(pages, DedupConfig())
        .select(col("url").as("vec_id"),
          Fns.sparseToDenseUdf(col("svec")).as("embedding"))
        .persist()
      vecs.count() // materialize before the multi-consumer fan-out
      val top3 = Ann.bruteForceTopK(vecs, vecs, k = 3)
      val eligible = top3.groupBy(col("query_id"))
        .agg(min(col("cosine")).as("c3"), count(lit(1)).as("k"))
        .filter(col("k") === 3 && col("c3") >= 0.90)
        .select(col("query_id")).orderBy("query_id").limit(20)
      // the self path buckets the WHOLE corpus on both sides (every doc is
      // a query); the assertion restricts to the eligible set afterwards
      val approx = Ann.selfTopK(vecs, k = 3, bitsPerTable = 6, nTables = 16)
        .select(col("query_id"), col("neighbor_id"))
      val hits = top3.select(col("query_id"), col("neighbor_id"))
        .join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      eligible.join(hits, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)) * 10000.0 / 3)
            .cast("bigint").as("recall_bp"))
        .orderBy("query_id")
    }),

    // ---- pages pipeline (deterministic in-session corpus; rows-only) ----

    // flagship clustering (SURVEY §7.1); components/keepers/splits + the
    // keeper's merged-away alt_urls lineage (stringified — the driver
    // harness hashes scalar columns). ORACLE-EXACT since round 3: DuckDB
    // recomputes the components from the aux corpus via all-pairs exact
    // cosine + a recursive-CTE closure, then replays split/keeper/alt_urls.
    "p_dedup_clusters" -> ((s, _) => {
      val pages = dedupAuxPages(s)
      DedupPipeline.run(s, pages)
        .select(col("url"), col("component"), col("chunk"),
          md5(concat_ws("#", col("component"), col("chunk")).cast("binary"))
            .as("cluster_md5"),
          col("cluster_size"), col("is_keeper"),
          coalesce(concat_ws(";", transform(col("alt_urls"), x => x.getField("url"))),
            lit("")).as("alt_urls"))
        .orderBy("component", "chunk", "url")
    }),

    // verified duplicate edges (SURVEY §2.4 J1). ORACLE-EXACT since round
    // 3: the LSH-banded + hamming-pregated + cosine-verified edge set must
    // EQUAL DuckDB's brute-force all-pairs cosine >= 0.90 over the same f32
    // vectors — candidate recall 1.0 and verify exactness in one check.
    "p_dedup_edges" -> ((s, _) => {
      val pages = dedupAuxPages(s)
      val cfg = DedupConfig()
      val sigs = DedupPipeline.signatures(pages, cfg)
      val cand = DedupPipeline.candidates(sigs, cfg)
      DedupPipeline.verifiedEdges(sigs, cand, cfg, diagnostics = true)
        // pairs are uid-ordered internally; present them url-ordered so the
        // edge SET comparison is orientation-free
        .select(least(col("url_a"), col("url_b")).as("url_a"),
          greatest(col("url_a"), col("url_b")).as("url_b"),
          bp(col("cosine"), 10000).as("cosine_bp"),
          col("simhash_hamming").cast("int").as("simhash_hamming"))
        .orderBy("url_a", "url_b")
    }),

    // multimodal feature extraction (real BMP/WAV/PNG codecs); oracle
    // re-derives n_bytes/dims/duration from the raw bytes' headers and the
    // content hash via md5-over-base64 — fully independent recomputation
    "m_media_features" -> ((s, _) => {
      val media = mediaAux(s)
      val feats = Multimodal.extractFeatures(s, media)
      // md5 over the HEX rendering (uppercase in both engines): DuckDB 1.0
      // has no md5(BLOB), and Spark's base64 is MIME-chunked (CRLF every 76
      // chars) — hex is the stable cross-engine byte rendering
      feats.join(media.select(col("media_id"),
          md5(encode(hex(col("bytes")), "UTF-8")).as("content_md5")), Seq("media_id"))
        .select(col("media_id"), col("kind"), col("n_bytes").cast("bigint").as("n_bytes"),
          col("width"), col("height"), col("duration_ms"), col("content_md5"))
        .orderBy("media_id")
    }),

    // streaming exact dedup-on-arrival (SURVEY §2.9), drained through a
    // MemoryStream: the emitted first-arrival set per content hash equals
    // DISTINCT md5(text) — order-independent, hence oracle-exact.
    // (MemoryStream is driver-fed by design: fixture-scale collect.)
    "s_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      val docs = ld(s, dir, "documents").select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        .map { case (id, text) => (new java.sql.Timestamp(base + id * 1000L), s"u$id", text) }
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String, String)]
      s.catalog.dropTempView("s_stream_dedup_sink")
      val q = graft.streaming.Streaming.exactDedupStream(
          in.toDF().toDF("warc_ts", "url", "text"))
        .select("content_md5")
        .writeStream.format("memory").queryName("s_stream_dedup_sink")
        .outputMode("append").start()
      docs.grouped(200).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      q.stop()
      s.table("s_stream_dedup_sink").orderBy("content_md5")
    }),

    // streaming watermarked windowed rollup (SURVEY §2.9), drained through
    // a MemoryStream with watermark-advancing sentinel rows so append mode
    // flushes every real window; values pre-scaled to integer cents so the
    // streaming sum is order-independent and oracle-exact
    "s_stream_windows" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val evs = ld(s, dir, "events")
        .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
          round(col("value") * 100).as("value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1.getTime)
      val maxTs = evs.map(_._1.getTime).max
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String, Double)]
      s.catalog.dropTempView("s_stream_windows_sink")
      val q = graft.streaming.Streaming.windowedEventStats(
          in.toDF().toDF("ts", "event_type", "value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("event_type"), col("n"), col("sum_value").cast("bigint").as("sum_value_c"))
        .writeStream.format("memory").queryName("s_stream_windows_sink")
        .outputMode("append").start()
      in.addData(evs.toSeq); q.processAllAvailable()
      // two sentinel batches: batch k emits windows the PREVIOUS batch's
      // watermark passed, so the second sentinel flushes everything real
      Seq(10L, 20L).foreach { hOff =>
        in.addData(Seq((new java.sql.Timestamp(maxTs + hOff * 3600000L), "__wm__", 0.0)))
        q.processAllAvailable()
      }
      q.stop()
      s.table("s_stream_windows_sink").filter(col("event_type") =!= "__wm__")
        .orderBy("h", "event_type")
    }),

    // extraction invariant audit (SURVEY §2.2 P1/P2): per-day doc stats +
    // count of rows violating text == extract(html) (must be 0)
    "p_extract_stats" -> ((s, _) => {
      val pages = PagesGen.generate(s, nDocs = 2000, nDomains = 100, seed = 42L)
      pages
        .withColumn("ok", Fns.extractTextUdf(col("html")) === col("text"))
        .groupBy(Fns.dayKey(col("warc_ts")).as("day"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ok"), 0).otherwise(1)).as("n_extract_mismatch"),
          sum(length(col("text"))).as("sum_chars"))
        .orderBy("day")
    }),

    // word-n-gram Jaccard near-dup pairs (SURVEY §2.3 E2 scalable twin),
    // oracle-exact over the documents table (df cap disabled so the n-gram
    // set matches the oracle's exact-gram computation; the cap path is
    // kernel-tested in OpsSpec)
    "d_ngram_jaccard" -> ((s, dir) =>
      TextOps.ngramJaccardPairs(
          ld(s, dir, "documents").select(col("doc_id"), col("text")),
          n = 3, minJaccard = 0.30, maxShingleDf = Int.MaxValue)
        .select(col("id_a"), col("id_b"), col("n_inter"),
          bp(col("jaccard"), 10000).as("jaccard_bp"))
        .orderBy("id_a", "id_b")),

    // data-quality coverage gate (SURVEY §2.5 A8)
    "q_coverage_gate" -> ((s, dir) => {
      Batching.coverageGate(ld(s, dir, "orders").select(col("o_orderkey").as("id")),
          ld(s, dir, "lineitem").select(col("l_orderkey").as("id")),
          "id", 0.95)
        .select(col("n_assigned"), col("n_population"),
          bp(col("coverage"), 10000).as("coverage_bp"), col("pass"))
    }),

    // two-phase salted aggregation (SURVEY §4 skew): identical result to
    // the direct GROUP BY the oracle runs
    "q_salted_custspend" -> ((s, dir) => {
      SkewOps.saltedAggBy(ld(s, dir, "orders"), col("o_custkey"), col("o_orderkey"),
          bp(col("o_totalprice"), 100))
        .select(col("key").as("o_custkey"), col("n"), col("total").as("spend_c"))
        .orderBy("o_custkey")
    }),

    // recency sort + limit (SURVEY §2.6 W1 retrieval cap)
    "q_recent_topn" -> ((s, dir) => {
      ld(s, dir, "events")
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(100)
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    // three-phase block dedup (SURVEY §2.5 A3 + §2.4 J4 + §2.5 A4) over a
    // deterministic nested-block synthesis seeded by the documents table.
    // ORACLE-EXACT since round 3: titles are synthesized mutually
    // non-similar (id + md5 — trigram cosine ~0.1), so the fuzzy phase is
    // provably a no-op on this input (it stays covered by BlockDedupSpec's
    // reference-port fixtures) and DuckDB replays exact-collapse + strict
    // subset absorption + chain resolution + renumber + section remap.
    "p_block_dedup" -> ((s, dir) => {
      val docs = ld(s, dir, "documents").filter(col("doc_id") < 120)
      val blocks = docs.select(
        col("doc_id").as("idx"),
        concat(lit("b"), col("doc_id"), lit("-"), md5(col("text").cast("binary"))).as("title"),
        // nested id sets: block i holds ids pool[(i%7) .. (i%7 + i%5)]
        transform(sequence(pmod(col("doc_id"), lit(7)),
            pmod(col("doc_id"), lit(7)) + pmod(col("doc_id"), lit(5))),
          x => concat(lit("a"), x)).as("article_ids"))
      val sections = docs.filter(col("doc_id") < 30)
        .groupBy(pmod(col("doc_id"), lit(5)).as("section_id"))
        .agg(first(lit("sec")).as("title"),
          collect_list(col("doc_id")).as("block_indices"))
      val (deduped, remapped) = BlockDedup.run(s, blocks, sections)
      // array columns stringified: the driver harness sorts/hashes scalar
      // columns only
      deduped.join(remapped.select(explode(col("block_indices")).as("idx"),
          col("section_id")), Seq("idx"), "left")
        .groupBy(col("idx"), col("title"), col("article_ids"))
        .agg(sort_array(collect_list(col("section_id"))).as("sections"))
        .select(col("idx"), col("title"),
          concat_ws(",", col("article_ids")).as("article_ids"),
          concat_ws(",", transform(col("sections"), x => x.cast("string"))).as("sections"))
        .orderBy("idx")
    }),

    // greedy NN ordering within dedup clusters (SURVEY §2.6 W3)
    "p_greedy_order" -> ((s, _) => {
      val pages = PagesGen.generate(s, nDocs = 1200, nDomains = 50, seed = 42L)
      val clusters = DedupPipeline.run(s, pages)
      val withText = clusters.join(pages.select(col("url"), col("text")), "url")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("cluster_id")).orderBy(col("warc_ts").desc, col("url"))))
      OrderingOps.greedyOrder(s, withText).orderBy("cluster_id", "position")
    }),

    // threshold calibration harness (SURVEY §2.5 A9), oracle-exact over an
    // events-derived labeled-pair table (the pages-truth variant is
    // parity-tested in Ops2Spec)
    "q_calibration_grid" -> ((s, dir) => {
      val pairs = ld(s, dir, "events").select(
        least(col("value") / 100.0, lit(1.0)).as("sim"),
        when(col("event_type") === "click", 1).otherwise(0).as("label"))
      Calibration.grid(s, pairs, Seq(0.70, 0.75, 0.80, 0.85, 0.90, 0.95))
        .select(col("threshold"), col("tp"), col("fp"), col("fn"),
          bp(col("f1"), 10000).as("f1_bp"))
        .orderBy("threshold")
    }),

    // smallest-free-id + max+1 batch-counter allocation (SURVEY §2.1 S10 +
    // §2.6 W4) as one distributed plan — no driver-side id-set collect
    "q_id_allocation" -> ((s, dir) => {
      val ids = ld(s, dir, "orders").select(col("o_orderkey").cast("long").as("id"))
      val existing = ids.filter(col("id") > 0)
      val candidates = existing.select((col("id") + 1).as("cand"))
        .union(s.range(1, 2).select(col("id").as("cand")))
      val freeId = candidates
        .join(existing, candidates("cand") === existing("id"), "left_anti")
        .agg(min(col("cand")).as("smallest_free_id"))
      val batch = ids.agg((max(col("id")) + 1).as("next_batch_id"))
      freeId.crossJoin(batch)
    }),

    // per-phase usage rollup via GROUPING SETS (SURVEY §2.5 A7; reference
    // per-phase usage aggregation, pipeline_setup.py:184-208)
    "q_usage_rollup" -> ((s, dir) => {
      ld(s, dir, "events")
        .rollup(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(bp(col("value"), 100)).as("sum_value_c"))
        .select(coalesce(col("event_type"), lit("ALL")).as("phase"),
          col("n"), col("sum_value_c"))
        .orderBy("phase")
    }),

    // SimHash near-dup buckets (SURVEY §2.3): docs whose 64-bit SimHash
    // matches on >= 1 of 4 16-bit bands join a candidate pool, verified by
    // hamming <= 6. ORACLE-EXACT since round 3: DuckDB recomputes the
    // banded pair set brute-force from the aux corpus simhashes.
    "p_simhash_pairs" -> ((s, _) => {
      val pages = dedupAuxPages(s)
      val cfg = DedupConfig()
      val sigs = DedupPipeline.signatures(pages, cfg)
        .filter(col("minhash").isNotNull)
        .select(col("url"), col("simhash"))
      val banded = sigs.select(col("url"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bits"))): _*)).as("bb"))
        .select(col("url"), col("simhash"), col("bb.band"), col("bb.bits"))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
            col("a.url") < col("b.url"))
        .select(col("a.url").as("url_a"), col("b.url").as("url_b"),
          Fns.hammingCol(col("a.simhash"), col("b.simhash")).as("hamming"))
        .dropDuplicates("url_a", "url_b")
        .filter(col("hamming") <= 6)
        .orderBy("url_a", "url_b")
    }))

  // ------------------------------------------------------------------
  // DuckDB oracle SQL (same tables, same column names). Omitted for the
  // non-SQL-expressible ops (UDF kernels / MinHash / generated corpora) —
  // those get rows-only checks here and exact ScalaTest oracles in-repo.
  // ------------------------------------------------------------------
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | count(*) AS n_rows,
        | CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS sum_price_c,
        | CAST(sum(round(l_extendedprice*(1-l_discount)*10000)) AS BIGINT) AS revenue_bp
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q3_top_revenue" ->
      """SELECT l_orderkey, o_orderdate,
        | CAST(sum(round(l_extendedprice*(1-l_discount)*10000)) AS BIGINT) AS revenue_bp
        |FROM customer JOIN orders ON c_custkey=o_custkey
        | JOIN lineitem ON o_orderkey=l_orderkey
        |WHERE c_mktsegment='BUILDING'
        |GROUP BY 1,2 ORDER BY revenue_bp DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        | CAST(sum(round(l_extendedprice*(1-l_discount)*10000)) AS BIGINT) AS revenue_bp
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        | JOIN customer ON o_custkey=c_custkey
        | JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        | JOIN nation ON s_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='EUROPE'
        |GROUP BY 1 ORDER BY revenue_bp DESC, n_name ASC""".stripMargin,
    "q_exists_bigqty" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey=o_orderkey AND l_quantity>=48)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cust_no_urgent" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey=c_custkey AND o_orderpriority='1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_top_order_per_cust" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |FROM (SELECT *, row_number() OVER
        |   (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn=1 ORDER BY o_custkey""".stripMargin,
    "q_daily_running" ->
      """SELECT d, n, CAST(sum(n) OVER (ORDER BY d
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
        |FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, count(*) AS n
        |  FROM orders GROUP BY 1) ORDER BY d""".stripMargin,
    "q_session_gaps" ->
      """SELECT user_id, count(*) AS n_gaps FROM (
        | SELECT user_id, epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |   (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
        | FROM events)
        |WHERE gap_us > 1800000000 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_event_type_topk" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(round(value*100)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1 ORDER BY n DESC, event_type ASC LIMIT 3""".stripMargin,
    "q_hourly_values" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
        | count(*) AS n,
        | CAST(sum(round(value*100)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1 ORDER BY h""".stripMargin,
    "q_lineitem_lastwins" ->
      """SELECT l_returnflag, count(*) AS n FROM (
        | SELECT l_returnflag, row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY l_shipdate DESC, l_linenumber DESC, l_returnflag DESC) AS rn
        | FROM lineitem) WHERE rn=1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_exact_dedup" ->
      """SELECT doc_id, md5(text) AS content_md5,
        | min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
        | count(*) OVER (PARTITION BY md5(text)) AS group_size,
        | doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_langid_counts" ->
      """SELECT CASE
        | WHEN trim(text) = '' THEN 'unknown'
        | WHEN regexp_matches(text, '[\x{0400}-\x{04FF}]')
        |  AND regexp_matches(text, '[\x{0459}\x{045A}\x{0452}\x{045B}\x{045F}\x{0408}\x{040A}\x{0402}\x{040B}\x{040F}\x{010D}\x{0107}\x{017E}\x{0161}\x{0111}\x{010C}\x{0106}\x{017D}\x{0160}\x{0110}]')
        |  THEN 'sr'
        | WHEN regexp_matches(text, '[\x{0400}-\x{04FF}]') THEN 'ru'
        | WHEN regexp_matches(text, '[A-Za-z]')
        |  AND regexp_matches(text, '[\x{0459}\x{045A}\x{0452}\x{045B}\x{045F}\x{0408}\x{040A}\x{0402}\x{040B}\x{040F}\x{010D}\x{0107}\x{017E}\x{0161}\x{0111}\x{010C}\x{0106}\x{017D}\x{0160}\x{0110}]')
        |  THEN 'sr'
        | WHEN regexp_matches(text, '[A-Za-z]') THEN 'en'
        | ELSE 'unknown' END AS lang_detected, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_quality" ->
      """SELECT doc_id,
        | length(trim(text)) AS n_chars,
        | CASE WHEN length(trim(text))=0 THEN 0
        |   ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        | length(trim(text)) - length(replace(trim(text), ' ', '')) AS n_spaces,
        | CASE WHEN length(trim(text))=0 THEN 0
        |   ELSE CAST(round((length(trim(text)) -
        |     (length(trim(text)) - length(replace(trim(text), ' ', '')))) * 100.0 /
        |     len(string_split_regex(trim(text), '\s+'))) AS BIGINT) END AS mean_token_len_c
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_fingerprints" ->
      // full 64-bit kernel replication in SQL: FNV-1a + splitmix64 via
      // HUGEINT split-multiplication (wrapping 64-bit arithmetic), winnow
      // minima via a 4-row sliding window; bit-exact vs the Scala kernel
      """WITH docs AS (
        | SELECT doc_id, text FROM documents),
        |-- fingerprint: FNV-1a over ws-collapsed stripped lowercase codepoints, then mix64
        |fcps AS (
        | SELECT doc_id, list_prepend(14695981039346656037::HUGEINT,
        |   [unicode(x)::HUGEINT for x in
        |    string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), '')]) AS l
        | FROM docs),
        |f0 AS (SELECT doc_id, list_reduce(l, (a, b) -> (((((xor(CAST((a) // 4294967296 AS BIGINT), CAST((b) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((a) % 4294967296 AS BIGINT), CAST((b) % 4294967296 AS BIGINT))::HUGEINT)) * 1099511628211::HUGEINT) % 18446744073709551616)) AS z FROM fcps),
        |f1 AS (SELECT doc_id, (((z) + 11400714819323198485::HUGEINT) % 18446744073709551616) AS z FROM f0),
        |f2 AS (SELECT doc_id, ((((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 1073741824)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 1073741824)) % 4294967296 AS BIGINT))::HUGEINT)) % 4294967296) * 13787848793156543929::HUGEINT + ((((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 1073741824)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 1073741824)) % 4294967296 AS BIGINT))::HUGEINT)) // 4294967296) * 13787848793156543929::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM f1),
        |f3 AS (SELECT doc_id, ((((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 134217728)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 134217728)) % 4294967296 AS BIGINT))::HUGEINT)) % 4294967296) * 10723151780598845931::HUGEINT + ((((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 134217728)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 134217728)) % 4294967296 AS BIGINT))::HUGEINT)) // 4294967296) * 10723151780598845931::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM f2),
        |fp AS (SELECT doc_id, ((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 2147483648)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 2147483648)) % 4294967296 AS BIGINT))::HUGEINT) AS m FROM f3),
        |-- winnow: k=7 shingle hashes over stripped lowercase (no ws collapse), w=4 minima
        |wcps AS (
        | SELECT doc_id,
        |   [unicode(x)::HUGEINT for x in string_split_regex(trim(lower(text)), '')] AS l
        | FROM docs),
        |pos AS (
        | SELECT doc_id, len(l) - 6 AS cnt, unnest(range(1, greatest(len(l) - 5, 1))) AS i, l
        | FROM wcps),
        |s0 AS (SELECT doc_id, cnt, i,
        |  list_reduce(list_prepend(14695981039346656037::HUGEINT, l[i:i+6]),
        |    (a, b) -> (((((xor(CAST((a) // 4294967296 AS BIGINT), CAST((b) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((a) % 4294967296 AS BIGINT), CAST((b) % 4294967296 AS BIGINT))::HUGEINT)) * 1099511628211::HUGEINT) % 18446744073709551616)) AS z FROM pos),
        |s1 AS (SELECT doc_id, cnt, i, (((z) + 11400714819323198485::HUGEINT) % 18446744073709551616) AS z FROM s0),
        |s2 AS (SELECT doc_id, cnt, i, ((((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 1073741824)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 1073741824)) % 4294967296 AS BIGINT))::HUGEINT)) % 4294967296) * 13787848793156543929::HUGEINT + ((((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 1073741824)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 1073741824)) % 4294967296 AS BIGINT))::HUGEINT)) // 4294967296) * 13787848793156543929::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM s1),
        |s3 AS (SELECT doc_id, cnt, i, ((((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 134217728)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 134217728)) % 4294967296 AS BIGINT))::HUGEINT)) % 4294967296) * 10723151780598845931::HUGEINT + ((((((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 134217728)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 134217728)) % 4294967296 AS BIGINT))::HUGEINT)) // 4294967296) * 10723151780598845931::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616) AS z FROM s2),
        |sh AS (SELECT doc_id, cnt, i, ((xor(CAST((z) // 4294967296 AS BIGINT), CAST((((z) // 2147483648)) // 4294967296 AS BIGINT))::HUGEINT) * 4294967296 + xor(CAST((z) % 4294967296 AS BIGINT), CAST((((z) // 2147483648)) % 4294967296 AS BIGINT))::HUGEINT) AS h FROM s3),
        |wins AS (
        | SELECT doc_id, cnt, i,
        |  min(h) OVER (PARTITION BY doc_id ORDER BY i
        |               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
        | FROM sh),
        |nw AS (
        | SELECT doc_id, count(DISTINCT m) AS n_winnow
        | FROM wins WHERE i <= cnt - 3 GROUP BY doc_id),
        |wfinal AS (
        | SELECT d.doc_id,
        |  CASE WHEN coalesce(c.cnt, 0) <= 0 THEN 0
        |       WHEN c.cnt <= 4 THEN 1
        |       ELSE n.n_winnow END AS n_winnow
        | FROM docs d
        | LEFT JOIN (SELECT DISTINCT doc_id, cnt FROM pos) c ON d.doc_id = c.doc_id
        | LEFT JOIN nw n ON d.doc_id = n.doc_id)
        |SELECT f.doc_id,
        | CAST(CASE WHEN f.m >= 9223372036854775808 THEN f.m - 18446744073709551616 ELSE f.m END AS BIGINT) AS fingerprint,
        | CAST(w.n_winnow AS INT) AS n_winnow
        |FROM fp f JOIN wfinal w ON f.doc_id = w.doc_id
        |ORDER BY f.doc_id""".stripMargin,
    "d_quality_full" ->
      """WITH t AS (
        | SELECT doc_id, text, length(text) AS n,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS rawtoks,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks,
        |  len(regexp_extract_all(text, '[^\p{L}\p{Nd}\s]')) AS punct,
        |  len(regexp_extract_all(text, '[\p{Nd}]')) AS digit,
        |  len(regexp_extract_all(text, '[\p{L}]+|[\p{Nd}]+|[^\p{L}\p{Nd}\s]')) AS bpe
        | FROM documents),
        |q AS (
        | SELECT doc_id, n, punct, digit, bpe,
        |  len(rawtoks) AS ws_tokens, len(toks) AS ntok,
        |  CASE WHEN len(toks)=0 THEN 0.0
        |    ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END AS mean_len,
        |  CASE WHEN len(toks)=0 THEN 0.0
        |    ELSE CAST(len(list_filter(toks, x -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it','that','for',
        |       'on','with','as','was','at','by','are','be','this','from','but',
        |       'not','have','had','has','they','you','we'], x))) AS DOUBLE) / len(toks) END AS stop_ratio
        | FROM t),
        |sc AS (
        | SELECT doc_id, ws_tokens, bpe, n,
        |  CASE WHEN n = 0 THEN 0.0 ELSE
        |   0.25 * (((least(1.0, n/200.0)
        |    + (CASE WHEN mean_len >= 3.0 AND mean_len <= 12.0 THEN 1.0 ELSE 0.5 END))
        |    + least(1.0, stop_ratio/0.2))
        |    + greatest(0.0, 1.0 - 2.0*((CAST(punct AS DOUBLE)/n) + (CAST(digit AS DOUBLE)/n))))
        |  END AS score
        | FROM q)
        |SELECT doc_id, CAST(ws_tokens AS INT) AS ws_tokens,
        | CAST(bpe AS INT) AS bpeish_tokens, CAST(n AS INT) AS n_chars,
        | CAST(round(score * 10000) AS BIGINT) AS quality_bp
        |FROM sc ORDER BY doc_id""".stripMargin,
    "q_coverage_gate" ->
      """WITH pop AS (SELECT DISTINCT o_orderkey AS id FROM orders),
        | hit AS (SELECT count(*) AS n_assigned FROM pop
        |   WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = pop.id))
        |SELECT n_assigned, (SELECT count(*) FROM pop) AS n_population,
        | CAST(round((n_assigned * 1.0 / (SELECT count(*) FROM pop)) * 10000) AS BIGINT)
        |   AS coverage_bp,
        | n_assigned * 1.0 / (SELECT count(*) FROM pop) >= 0.95 AS pass
        |FROM hit""".stripMargin,
    "q_salted_custspend" ->
      """SELECT o_custkey, count(*) AS n,
        | CAST(sum(round(o_totalprice*100)) AS BIGINT) AS spend_c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_recent_topn" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 100""".stripMargin,
    "d_ngram_jaccard" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
        |), grams AS (
        | SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        | FROM toks WHERE len(w) >= 3
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS n_inter,
        | CAST(round((len(list_intersect(a.g, b.g)) * 1.0 /
        |      (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))) * 10000) AS BIGINT) AS jaccard_bp
        |FROM grams a, grams b
        |WHERE a.doc_id < b.doc_id
        |  AND len(list_intersect(a.g, b.g)) * 1.0 /
        |      (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.30
        |ORDER BY id_a, id_b""".stripMargin,
    "q_calibration_grid" ->
      """WITH pairs AS (
        | SELECT least(value/100.0, 1.0) AS sim,
        |        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS label
        | FROM events
        |), grid AS (SELECT CAST(unnest([0.70, 0.75, 0.80, 0.85, 0.90, 0.95]) AS DOUBLE) AS threshold),
        |m AS (
        | SELECT threshold,
        |  CAST(sum(CASE WHEN sim >= threshold AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN sim >= threshold AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN sim < threshold AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        | FROM pairs CROSS JOIN grid GROUP BY threshold)
        |SELECT threshold, tp, fp, fn,
        | CAST(round(CASE WHEN tp = 0 THEN NULL ELSE
        |   2.0 * (tp*1.0/(tp+fp)) * (tp*1.0/(tp+fn)) /
        |   ((tp*1.0/(tp+fp)) + (tp*1.0/(tp+fn))) END * 10000) AS BIGINT) AS f1_bp
        |FROM m ORDER BY threshold""".stripMargin,
    "q_id_allocation" ->
      """SELECT
        | (SELECT min(cand) FROM (
        |    SELECT o_orderkey + 1 AS cand FROM orders WHERE o_orderkey > 0
        |    UNION SELECT 1) c
        |  WHERE cand NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey > 0)
        | ) AS smallest_free_id,
        | (SELECT max(o_orderkey) + 1 FROM orders) AS next_batch_id""".stripMargin,
    "q_usage_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS phase, count(*) AS n,
        | CAST(sum(round(value*100)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY ROLLUP(event_type) ORDER BY phase""".stripMargin,
    "p_dedup_edges" ->
      """WITH c AS MATERIALIZED (
        | SELECT url, simhash, CAST(vec AS DOUBLE[]) AS vec
        | FROM read_parquet('/root/repo/target/verify_aux/dedup_corpus.parquet/*.parquet'))
        |SELECT a.url AS url_a, b.url AS url_b,
        | CAST(round(least(list_dot_product(a.vec, b.vec), 1.0) * 10000) AS BIGINT) AS cosine_bp,
        | CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS simhash_hamming
        |FROM c a JOIN c b ON a.url < b.url
        |WHERE list_dot_product(a.vec, b.vec) >= 0.90
        |ORDER BY url_a, url_b""".stripMargin,
    "p_dedup_clusters" ->
      """WITH RECURSIVE
        |c AS MATERIALIZED (
        | SELECT url, warc_ts, n_chars, CAST(vec AS DOUBLE[]) AS vec
        | FROM read_parquet('/root/repo/target/verify_aux/dedup_corpus.parquet/*.parquet')),
        |e AS MATERIALIZED (
        | SELECT a.url AS u, b.url AS v FROM c a JOIN c b ON a.url < b.url
        | WHERE list_dot_product(a.vec, b.vec) >= 0.90),
        |sym AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |reach(u, v) AS (
        | SELECT u, v FROM sym
        | UNION
        | SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u),
        |comp AS (SELECT u AS url, least(u, min(v)) AS comp0 FROM reach GROUP BY u),
        |m AS (SELECT comp.url, comp.comp0, c.warc_ts, c.n_chars
        |      FROM comp JOIN c ON comp.url = c.url),
        |sized AS (SELECT *,
        |  count(*) OVER (PARTITION BY comp0) AS comp_size,
        |  row_number() OVER (PARTITION BY comp0 ORDER BY warc_ts DESC, url ASC) AS rn,
        |  min(url) OVER (PARTITION BY comp0) AS component
        | FROM m),
        |chunked AS (SELECT *, CAST(floor((rn - 1) / 20) AS INT) AS chunk
        |            FROM sized WHERE comp_size >= 2),
        |cs AS (SELECT *, count(*) OVER (PARTITION BY comp0, chunk) AS cluster_size
        |       FROM chunked),
        |k AS (SELECT *, (row_number() OVER (PARTITION BY comp0, chunk
        |        ORDER BY n_chars DESC, rn ASC)) = 1 AS is_keeper
        |      FROM cs WHERE cluster_size >= 2),
        |alt AS (SELECT comp0, chunk,
        |        string_agg(CASE WHEN NOT is_keeper THEN url END, ';' ORDER BY rn) AS alts
        |        FROM k GROUP BY comp0, chunk)
        |SELECT k.url, k.component, k.chunk,
        | md5(k.component || '#' || CAST(k.chunk AS VARCHAR)) AS cluster_md5,
        | k.cluster_size, k.is_keeper,
        | CASE WHEN k.is_keeper THEN coalesce(alt.alts, '') ELSE '' END AS alt_urls
        |FROM k JOIN alt USING (comp0, chunk)
        |ORDER BY component, chunk, url""".stripMargin,
    "m_media_features" ->
      """WITH m AS (
        | SELECT media_id, kind, bytes, hex(bytes) AS hx, octet_length(bytes) AS n_bytes
        | FROM read_parquet('/root/repo/target/verify_aux/media.parquet/*.parquet')),
        |b AS (SELECT media_id, kind, n_bytes, bytes,
        |  list_transform(range(1, 45), i ->
        |    (instr('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16 +
        |     instr('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS bv
        | FROM m)
        |SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
        | CAST(CASE WHEN bv[1]=66 AND bv[2]=77
        |   THEN bv[19] + 256*bv[20] + 65536*bv[21] + 16777216*bv[22] ELSE 0 END AS INT) AS width,
        | CAST(CASE WHEN bv[1]=66 AND bv[2]=77
        |   THEN bv[23] + 256*bv[24] + 65536*bv[25] + 16777216*bv[26] ELSE 0 END AS INT) AS height,
        | CAST(CASE WHEN bv[1]=82 AND bv[2]=73 AND bv[3]=70 AND bv[4]=70
        |       AND bv[9]=87 AND bv[10]=65 AND bv[11]=86 AND bv[12]=69
        |   THEN (((bv[41] + 256*bv[42] + 65536*bv[43] + 16777216*bv[44]) // 2
        |          // (bv[23] + 256*bv[24])) * 1000)
        |        // (bv[25] + 256*bv[26] + 65536*bv[27] + 16777216*bv[28])
        |   ELSE 0 END AS INT) AS duration_ms,
        | md5(hex(bytes)) AS content_md5
        |FROM b ORDER BY media_id""".stripMargin,
    "p_block_dedup" ->
      """WITH RECURSIVE
        |docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 120),
        |blocks AS (SELECT doc_id AS idx,
        |  'b' || CAST(doc_id AS VARCHAR) || '-' || md5(text) AS title,
        |  ['a' || CAST(x AS VARCHAR)
        |   for x in range(doc_id % 7, doc_id % 7 + doc_id % 5 + 1)] AS aids
        | FROM docs),
        |keyed AS (SELECT idx, title, aids,
        |  list_sort(list_distinct(aids)) AS key FROM blocks),
        |p1 AS (SELECT idx, key,
        |  row_number() OVER (PARTITION BY key
        |    ORDER BY length(title) DESC, idx ASC) AS rn FROM keyed),
        |p1win AS (SELECT key, idx AS winner FROM p1 WHERE rn = 1),
        |phase1 AS (SELECT k.idx, w.winner FROM keyed k JOIN p1win w USING (key)),
        |uniq AS (SELECT k.idx AS uidx, k.key, len(k.key) AS ksz
        |         FROM keyed k JOIN p1win w ON k.idx = w.winner AND k.key = w.key),
        |subs AS (SELECT a.uidx AS i, b.uidx AS j, b.ksz AS szj
        |  FROM uniq a JOIN uniq b
        |  ON a.uidx <> b.uidx AND a.ksz < b.ksz AND list_has_all(b.key, a.key)),
        |absorbed AS (SELECT i, j AS target FROM (
        |  SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY szj, j) AS rn
        |  FROM subs) WHERE rn = 1),
        |hop(u, w) AS (
        |  SELECT i, target FROM absorbed
        |  UNION
        |  SELECT h.u, a.target FROM hop h JOIN absorbed a ON h.w = a.i),
        |term AS (SELECT u, w FROM hop
        |  WHERE w NOT IN (SELECT i FROM absorbed)),
        |fullmap AS (SELECT p.idx AS o, coalesce(t.w, p.winner) AS fw
        |  FROM phase1 p LEFT JOIN term t ON p.winner = t.u),
        |finals AS (SELECT DISTINCT fw FROM fullmap),
        |renum AS (SELECT fw AS oldidx,
        |  row_number() OVER (ORDER BY fw) - 1 AS new_idx FROM finals),
        |o2n AS (SELECT f.o, r.new_idx FROM fullmap f JOIN renum r ON f.fw = r.oldidx),
        |secpairs AS (SELECT DISTINCT d.doc_id % 5 AS section_id, m.new_idx
        |  FROM docs d JOIN o2n m ON d.doc_id = m.o WHERE d.doc_id < 30),
        |secs AS (SELECT new_idx,
        |  string_agg(CAST(section_id AS VARCHAR), ',' ORDER BY section_id) AS s
        |  FROM secpairs GROUP BY new_idx)
        |SELECT r.new_idx AS idx, b.title,
        |  array_to_string(b.aids, ',') AS article_ids,
        |  coalesce(s.s, '') AS sections
        |FROM renum r JOIN blocks b ON b.idx = r.oldidx
        |LEFT JOIN secs s ON s.new_idx = r.new_idx
        |ORDER BY idx""".stripMargin,
    "p_simhash_pairs" ->
      """WITH c AS MATERIALIZED (
        | SELECT url, simhash
        | FROM read_parquet('/root/repo/target/verify_aux/dedup_corpus.parquet/*.parquet'))
        |SELECT a.url AS url_a, b.url AS url_b,
        | CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM c a JOIN c b ON a.url < b.url
        |WHERE ((a.simhash >> 0) & 65535 = (b.simhash >> 0) & 65535
        |    OR (a.simhash >> 16) & 65535 = (b.simhash >> 16) & 65535
        |    OR (a.simhash >> 32) & 65535 = (b.simhash >> 32) & 65535
        |    OR (a.simhash >> 48) & 65535 = (b.simhash >> 48) & 65535)
        |  AND bit_count(xor(a.simhash, b.simhash)) <= 6
        |ORDER BY url_a, url_b""".stripMargin,
    "s_stream_dedup" ->
      """SELECT DISTINCT md5(text) AS content_md5 FROM documents
        |ORDER BY content_md5""".stripMargin,
    "s_stream_windows" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
        | event_type, count(*) AS n,
        | CAST(sum(round(value*100)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,
    "e_cosine_topk" ->
      """SELECT query_id, neighbor_id, rank FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(c.embedding AS DOUBLE[])) DESC,
        |    c.vec_id ASC) AS rank
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // recomputes the brute-force top-3 + the eligible-query set fully
    // independently over the aux corpus vectors; its rows are the ASSERTION
    // that the LSH path recovered every true neighbor (n_hit = 3 per query)
    // NB eligibility "exact top-3 all >= 0.90" is rewritten as ">= 3
    // neighbors at cosine >= 0.90" (equivalent: if 3+ neighbors clear 0.90
    // the global top-3 is inside that set) so the threshold filter prunes
    // the 9M-pair scan BEFORE the window — p_dedup_edges-class cost instead
    // of a window over the full all-pairs product.
    "e_ann_recall" ->
      """WITH c AS MATERIALIZED (
        | SELECT url, CAST(vec AS DOUBLE[]) AS vec
        | FROM read_parquet('/root/repo/target/verify_aux/dedup_corpus.parquet/*.parquet')),
        |p90 AS MATERIALIZED (
        | SELECT a.url AS query_id, b.url AS neighbor_id,
        |  list_dot_product(a.vec, b.vec) AS cosine
        | FROM c a JOIN c b ON a.url <> b.url
        | WHERE list_dot_product(a.vec, b.vec) >= 0.90),
        |eligible AS (
        | SELECT query_id FROM p90 GROUP BY query_id
        | HAVING count(*) >= 3
        | ORDER BY query_id LIMIT 20),
        |top3 AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT p.query_id, p.neighbor_id,
        |   row_number() OVER (PARTITION BY p.query_id
        |     ORDER BY p.cosine DESC, p.neighbor_id ASC) AS rank
        |  FROM p90 p JOIN eligible e USING (query_id))
        | WHERE rank <= 3)
        |SELECT query_id, count(*) AS n_hit,
        | CAST(round(count(*) * 10000.0 / 3) AS BIGINT) AS recall_bp
        |FROM top3 GROUP BY query_id ORDER BY query_id""".stripMargin,
    // the self-join ANN path asserts the SAME brute-force ground truth (the
    // oracle is identical by construction: eligible queries + their exact
    // top-3, n_hit=3 iff the approximate structure recovered all of it)
    "e_ann_self_recall" ->
      """WITH c AS MATERIALIZED (
        | SELECT url, CAST(vec AS DOUBLE[]) AS vec
        | FROM read_parquet('/root/repo/target/verify_aux/dedup_corpus.parquet/*.parquet')),
        |p90 AS MATERIALIZED (
        | SELECT a.url AS query_id, b.url AS neighbor_id,
        |  list_dot_product(a.vec, b.vec) AS cosine
        | FROM c a JOIN c b ON a.url <> b.url
        | WHERE list_dot_product(a.vec, b.vec) >= 0.90),
        |eligible AS (
        | SELECT query_id FROM p90 GROUP BY query_id
        | HAVING count(*) >= 3
        | ORDER BY query_id LIMIT 20),
        |top3 AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT p.query_id, p.neighbor_id,
        |   row_number() OVER (PARTITION BY p.query_id
        |     ORDER BY p.cosine DESC, p.neighbor_id ASC) AS rank
        |  FROM p90 p JOIN eligible e USING (query_id))
        | WHERE rank <= 3)
        |SELECT query_id, count(*) AS n_hit,
        | CAST(round(count(*) * 10000.0 / 3) AS BIGINT) AS recall_bp
        |FROM top3 GROUP BY query_id ORDER BY query_id""".stripMargin)
}
