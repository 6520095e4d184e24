package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{HtmlText, LangDetect, MinHash}

/** Deterministic synthetic Common-Crawl-style pages table.
  *
  * Produces the BASELINE.json input shape
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`
  * plus generator-truth columns (`truth_family`, `is_dup_slot`) used only by
  * tests/benchmarks. Fully seed-stable and embarrassingly parallel: every row
  * is a pure function of (seed, id), generated via `spark.range` →
  * per-row derivation (no driver-side state, no joins), so it scales to any
  * row count on any cluster.
  *
  * Duplicate structure: ids are grouped into 32-slot families
  * (`famId = id / 32`). Each family draws an active size in {1,2,3,5,8,25,32}
  * (hash-weighted; mostly small); active slots beyond slot 0 are near-dup
  * mutations of the family seed text, inactive slots are unrelated singleton
  * docs. Sizes 25/32 exercise the reference's >20 component split
  * (`recap/dedup/cluster.py:42-48`); mutation ops mirror the fixture
  * generator (token replace/delete/insert).
  *
  * Skew: domains are drawn log-uniform (Zipf-ish s≈1) over `nDomains`, so a
  * handful of hot domains dominate — exercising salting/AQE paths.
  */
object PagesGen {

  final val FamilyWidth = 32
  private val Sizes = Array(1, 1, 1, 1, 2, 2, 3, 3, 5, 8, 25, 32)

  // Deterministic per-language vocabularies with character-diverse words
  // (full alphabets, varied lengths) so unrelated documents have genuinely
  // distant char-trigram distributions — a syllable-recombination vocab
  // makes every doc look like a near-dup at trigram granularity.
  private val EnAlpha = ('a' to 'z').mkString
  private val RuAlpha = ('а' to 'я').mkString
  private val SrAlpha = EnAlpha + "čćžšđ"
  private def mkWord(alpha: String, i: Int): String = {
    var h = MinHash.mix64(0x77AB1EL + i)
    val len = 4 + (h & 0x7L).toInt // 4..11
    val sb = new java.lang.StringBuilder(len)
    var j = 0
    while (j < len) {
      h = MinHash.mix64(h)
      sb.append(alpha.charAt(((h >>> 8) % alpha.length).toInt))
      j += 1
    }
    sb.toString
  }
  private def vocabEn(i: Int): String = mkWord(EnAlpha, i)
  private def vocabRu(i: Int): String = mkWord(RuAlpha, i + 100000)
  private def vocabSr(i: Int): String = mkWord(SrAlpha, i + 200000)

  // 20k words per language: enough shingle diversity that unrelated docs
  // collide in LSH band buckets about as rarely as real web text does. A
  // 2k vocab saturates the 3-gram space and manufactures mega-buckets of
  // unrelated docs whose pair mass grows quadratically with corpus size —
  // an artifact real Common-Crawl shingle distributions don't have (the
  // capHotBuckets layer still guards the real-world analog: boilerplate).
  private val VocabSize = 20000

  /** xorshift-ish deterministic stream from a seed; pure, allocation-free. */
  private final class Rng(seed0: Long) {
    private var s = MinHash.mix64(seed0)
    def nextLong(): Long = { s = MinHash.mix64(s + 0x9E3779B97F4A7C15L); s }
    def nextInt(bound: Int): Int = (((nextLong() >>> 1) % bound).toInt)
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private def word(lang: String, i: Int): String = lang match {
    case "ru" => vocabRu(i)
    case "sr" => vocabSr(i)
    case _    => vocabEn(i)
  }

  /** Family-level deterministic attributes. */
  private def famLang(famId: Long, seed: Long): String = {
    val r = MinHash.mix64(seed ^ famId ^ 0x51L)
    val m = ((r >>> 8) % 10).toInt
    if (m < 6) "en" else if (m < 9) "ru" else "sr"
  }
  private def famSize(famId: Long, seed: Long): Int =
    Sizes(((MinHash.mix64(seed ^ famId ^ 0x7fL) >>> 7) % Sizes.length).toInt)

  /** Seed body text of a family: 80-160 vocab words. Doc length is capped
    * well below the point where 384-bucket trigram vectors saturate —
    * unrelated docs of 300+ words exceed cosine 0.90 purely from bucket
    * saturation (measured: rand-pair max 0.91 at 300 words vs 0.79 at 120),
    * which is a property of the reference's embedder, not of this corpus. */
  private def seedTokens(famId: Long, seed: Long, lang: String): Array[String] = {
    val rng = new Rng(seed ^ (famId * 0x9E37L) ^ 0xABCDL)
    val n = 80 + rng.nextInt(81)
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = word(lang, rng.nextInt(VocabSize)); i += 1 }
    toks
  }

  private def mutate(toks: Array[String], lang: String, rng: Rng): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.from(toks)
    val ops = 1 + rng.nextInt(5)
    var k = 0
    while (k < ops) {
      val i = rng.nextInt(out.length)
      val r = rng.nextDouble()
      if (r < 0.4) out(i) = word(lang, rng.nextInt(VocabSize))
      else if (r < 0.7 && out.length > 5) out.remove(i)
      else out.insert(i, word(lang, rng.nextInt(VocabSize)))
      k += 1
    }
    out.toArray
  }

  /** Unrelated singleton body. */
  private def singletonTokens(id: Long, seed: Long, lang: String): Array[String] = {
    val rng = new Rng(seed ^ (id * 0x5DEECE66DL) ^ 0x1234L)
    val n = 60 + rng.nextInt(121)
    Array.tabulate(n)(_ => word(lang, rng.nextInt(VocabSize)))
  }

  /** Zipf-ish (log-uniform) domain index: rank 0 is hottest. */
  private def domainRank(id: Long, seed: Long, nDomains: Int): Int = {
    val rng = new Rng(seed ^ id ^ 0xD0D0L)
    val u = rng.nextDouble()
    math.min(nDomains - 1, (math.exp(u * math.log(nDomains.toDouble + 1)) - 1).toInt)
  }

  /** Per-domain boilerplate wrapped around the body — nav/footer with
    * script/style blocks and HTML entities, so extraction does real work.
    */
  private def renderHtml(domain: String, title: String, body: String, rng: Rng): String = {
    val navItems = (0 until 4).map(i => s"<a href='/$i'>${domain}-nav$i</a>").mkString(" | ")
    val noise = if (rng.nextDouble() < 0.5) "&nbsp;&copy; 2026 &mdash;" else "&laquo;feed&raquo;"
    s"""<html><head><title>$title</title>
       |<style>.m { color: #${rng.nextInt(4096)}; }</style>
       |<script type="text/javascript">var trk="$domain"; if (1<2) { track(); }</script>
       |</head><body>
       |<div class="nav">$navItems</div>
       |<h1>$title</h1>
       |<div class="content">$body</div>
       |<div class="footer">$noise $domain</div>
       |<script>footerTrack("${rng.nextInt(1 << 20)}");</script>
       |</body></html>""".stripMargin
  }

  final val Schema = "url string, warc_ts timestamp, html binary, text string, lang string, truth_family bigint"

  /** Generate the pages table. `truth_family` is -1 for singletons. */
  def generate(spark: SparkSession, nDocs: Long, nDomains: Int = 1000,
               nDays: Int = 7, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val partitions = math.max(spark.sparkContext.defaultParallelism,
      math.min(4096L, nDocs / 20000 + 1).toInt)
    spark.range(0, nDocs, 1, partitions).map { id =>
      val famId = id / FamilyWidth
      val slot = (id % FamilyWidth).toInt
      val size = famSize(famId, seed)
      val isDup = slot < size && size >= 2
      val lang0 = famLang(famId, seed)
      val lang = if (isDup) lang0 else famLang(id * 31 + 7, seed)
      val toks =
        if (!isDup) singletonTokens(id, seed, lang)
        else if (slot == 0) seedTokens(famId, seed, lang)
        else mutate(seedTokens(famId, seed, lang), lang, new Rng(seed ^ id ^ 0xFEEDL))
      val body = toks.mkString(" ")
      val rank = domainRank(id, seed, nDomains)
      val domain = s"www.d$rank.example"
      val title = s"doc-$id ${toks.take(4).mkString(" ")}"
      val rng = new Rng(seed ^ id ^ 0xB0B0L)
      val html = renderHtml(domain, title, body, rng)
      val text = HtmlText.htmlToText(html)
      val day = (MinHash.mix64(seed ^ id ^ 0xDA7EL) >>> 9) % nDays
      val sec = (MinHash.mix64(seed ^ id ^ 0x7153L) >>> 9) % 86400
      // base: 2026-01-01T00:00:00Z
      val ts = new java.sql.Timestamp((1767225600L + day * 86400L + sec) * 1000L)
      val url = s"https://$domain/articles/${famId}/doc-$id?src=gen"
      (url, ts, html.getBytes("UTF-8"), text, LangDetect.detect(text),
        if (isDup) famId else -1L)
    }.toDF("url", "warc_ts", "html", "text", "lang", "truth_family")
  }
}
