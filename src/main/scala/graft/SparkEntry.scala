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

    // ---- pages pipeline (deterministic in-session corpus; rows-only) ----

    // flagship clustering (SURVEY §7.1); components/keepers/splits + the
    // keeper's merged-away alt_urls lineage (stringified — the driver
    // harness hashes scalar columns)
    "p_dedup_clusters" -> ((s, _) => {
      val pages = PagesGen.generate(s, nDocs = 3000, nDomains = 100, seed = 42L)
      DedupPipeline.run(s, pages)
        .select(col("url"), col("component"), col("chunk"), col("cluster_id"),
          col("cluster_size"), col("is_keeper"),
          coalesce(concat_ws(";", transform(col("alt_urls"), x => x.getField("url"))),
            lit("")).as("alt_urls"))
        .orderBy("cluster_id", "url")
    }),

    // verified duplicate edges w/ similarity diagnostics (SURVEY §2.4 J1)
    "p_dedup_edges" -> ((s, _) => {
      val pages = PagesGen.generate(s, nDocs = 3000, nDomains = 100, seed = 42L)
      val cfg = DedupConfig()
      val sigs = DedupPipeline.signatures(pages, cfg)
      val cand = DedupPipeline.candidates(sigs, cfg)
      DedupPipeline.verifiedEdges(sigs, cand, cfg, diagnostics = true)
        .select(col("url_a"), col("url_b"), bp(col("cosine"), 10000).as("cosine_bp"),
          bp(col("est_jaccard"), 10000).as("est_jaccard_bp"), col("simhash_hamming"))
        .orderBy("url_a", "url_b")
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
    // deterministic nested-block synthesis seeded by the documents table
    "p_block_dedup" -> ((s, dir) => {
      val docs = ld(s, dir, "documents").filter(col("doc_id") < 120)
      val blocks = docs.select(
        col("doc_id").as("idx"),
        substring(col("text"), 1, 40).as("title"),
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
    // matches on 3-of-4 16-bit bands join a candidate pool, verified by
    // hamming <= 6
    "p_simhash_pairs" -> ((s, _) => {
      val pages = PagesGen.generate(s, nDocs = 1500, nDomains = 100, seed = 42L)
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
    "e_cosine_topk" ->
      """SELECT query_id, neighbor_id, rank FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(c.embedding AS DOUBLE[])) DESC,
        |    c.vec_id ASC) AS rank
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)
}
