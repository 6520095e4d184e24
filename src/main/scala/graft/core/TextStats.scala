package graft.core

/** Text-analysis kernel for the training-data pipeline operators:
  * token counting (whitespace + BPE-ish regex), quality scoring
  * (length / punctuation / stopword ratios, in the spirit of the reference's
  * quality threshold filter `recap/storage/pipeline_io.py:284-288` and
  * `clean_text_chars` bookkeeping), and rolling-hash document fingerprints.
  */
object TextStats {

  /** Whitespace token count (Python `str.split()` semantics: runs collapse,
    * leading/trailing ignored).
    */
  def wsTokenCount(text: String): Int = {
    if (text == null) return 0
    var count = 0
    var inTok = false
    var i = 0
    while (i < text.length) {
      val ws = PyText.isPyWs(text.charAt(i))
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    count
  }

  /** BPE-ish token count: word pieces, numbers, and individual
    * punctuation/symbol marks — a deterministic proxy for subword tokenizers.
    */
  private val BpeTok = java.util.regex.Pattern.compile(
    "[\\p{L}]+|[\\p{Nd}]+|[^\\p{L}\\p{Nd}\\s]")
  def bpeishTokenCount(text: String): Int = {
    if (text == null) return 0
    val m = BpeTok.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  private val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "are", "be", "this",
    "from", "but", "not", "have", "had", "has", "they", "you", "we")

  /** Quality features over a document. All deterministic, locale-free. */
  final case class Quality(
      nChars: Int,
      nTokens: Int,
      meanTokenLen: Double,
      punctRatio: Double,
      stopwordRatio: Double,
      digitRatio: Double,
      score: Double)

  def quality(text: String): Quality = {
    if (text == null || text.isEmpty) return Quality(0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val n = PyText.pyLen(text)
    var punct = 0; var digit = 0
    text.codePoints().forEach { cp =>
      val t = Character.getType(cp)
      if (t == Character.DECIMAL_DIGIT_NUMBER) digit += 1
      else if (!Character.isLetterOrDigit(cp) && !Character.isWhitespace(cp)
        && !PyText.WsChars.contains(cp)) punct += 1
    }
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[" + PyText.WsClass + "]+").filter(_.nonEmpty)
    val nTok = toks.length
    val meanLen = if (nTok == 0) 0.0 else toks.map(_.length).sum.toDouble / nTok
    val stopRatio = if (nTok == 0) 0.0 else toks.count(Stopwords.contains).toDouble / nTok
    val punctRatio = punct.toDouble / n
    val digitRatio = digit.toDouble / n
    // heuristic score in [0,1]: long enough, word-shaped, some stopwords,
    // not punctuation/digit soup
    val lenScore = math.min(1.0, n / 200.0)
    val shapeScore = if (meanLen >= 3.0 && meanLen <= 12.0) 1.0 else 0.5
    val stopScore = math.min(1.0, stopRatio / 0.2)
    val noiseScore = math.max(0.0, 1.0 - 2.0 * (punctRatio + digitRatio))
    val score = 0.25 * (lenScore + shapeScore + stopScore + noiseScore)
    Quality(n, nTok, meanLen, punctRatio, stopRatio, digitRatio, score)
  }

  /** 64-bit rolling-hash fingerprint of the normalized whole document
    * (content-defined: whitespace-insensitive, case-insensitive).
    */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    val norm = PyText.pyStrip(text.toLowerCase(java.util.Locale.ROOT))
    var h = 0xCBF29CE484222325L
    var lastWs = false
    norm.codePoints().forEach { cp0 =>
      val ws = PyText.WsChars.contains(cp0)
      if (!ws) {
        h = (h ^ cp0) * 0x100000001B3L
        lastWs = false
      } else if (!lastWs) {
        h = (h ^ ' '.toInt) * 0x100000001B3L
        lastWs = true
      }
    }
    MinHash.mix64(h)
  }

  /** Winnowing fingerprints: min rolling hash per window of `w` consecutive
    * k-shingle hashes — the standard local fingerprint set for substring-level
    * copy detection (public algorithm: Schleimer, Wilkerson, Aiken 2003).
    */
  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    val sh = {
      // ordered (non-distinct) shingle hashes
      if (text == null) Array.emptyLongArray
      else {
        val norm = PyText.pyStrip(text.toLowerCase(java.util.Locale.ROOT))
        val cps = PyText.codePoints(norm)
        if (cps.length < k) Array.emptyLongArray
        else {
          val out = new Array[Long](cps.length - k + 1)
          var i = 0
          while (i <= cps.length - k) {
            var h = 0xCBF29CE484222325L
            var j = i
            while (j < i + k) { h = (h ^ cps(j)) * 0x100000001B3L; j += 1 }
            out(i) = MinHash.mix64(h)
            i += 1
          }
          out
        }
      }
    }
    if (sh.isEmpty) return Array.emptyLongArray
    if (sh.length <= w) return Array(sh.min)
    val picked = scala.collection.mutable.LinkedHashSet[Long]()
    var i = 0
    while (i + w <= sh.length) {
      var m = sh(i); var j = i + 1
      while (j < i + w) { if (java.lang.Long.compareUnsigned(sh(j), m) < 0) m = sh(j); j += 1 }
      picked.add(m)
      i += 1
    }
    picked.toArray
  }
}
