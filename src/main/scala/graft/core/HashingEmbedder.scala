package graft.core

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

/** Deterministic 384-dim hashed-character-trigram embedder.
  *
  * Bit-reproducible port of `HashingEmbedder._embed_single`
  * (`/root/reference/src/news_recap/recap/dedup/embedder.py:43-72`):
  * lowercase+strip, pad to >= 3 code points, for each char 3-gram take
  * `little_endian_u32(sha1(utf8(ngram))[0:4]) % 384` and bump that bucket,
  * then L2-normalize. Accumulation is float32 (counts are exact below 2^24),
  * the norm is a float64 left-to-right sum of float64 squares of the float32
  * values, and the division result is rounded back to float32 — exactly the
  * CPython `array("f")` arithmetic, so threshold-edge cosine pairs do not flip.
  *
  * sha1-per-trigram is the hot cost at scale; the distinct-trigram space is
  * tiny relative to the corpus, so buckets are memoized in a bounded
  * process-wide map (per-executor; safe because the function is pure).
  */
object HashingEmbedder {
  final val Dimensions = 384
  final val NgramSize = 3

  private final val MaxCache = 1 << 20
  private val bucketCache = new ConcurrentHashMap[String, Integer](1 << 16)

  private def bucketOf(ngram: String): Int = {
    val cached = bucketCache.get(ngram)
    if (cached != null) return cached.intValue()
    val md = MessageDigest.getInstance("SHA-1")
    val d = md.digest(ngram.getBytes("UTF-8"))
    val le = (d(0) & 0xffL) | ((d(1) & 0xffL) << 8) | ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 24)
    val b = (le % Dimensions).toInt
    if (bucketCache.size < MaxCache) bucketCache.put(ngram, Integer.valueOf(b))
    b
  }

  /** Embed one text into a normalized 384-dim float32 vector. */
  def embed(text: String): Array[Float] = {
    val vector = new Array[Float](Dimensions)
    if (text == null) return vector
    var normalized = PyText.pyStrip(text.toLowerCase(java.util.Locale.ROOT))
    if (normalized.isEmpty) return vector

    val cps0 = PyText.codePoints(normalized)
    val cps =
      if (cps0.length < NgramSize) cps0 ++ Array.fill(NgramSize - cps0.length)(' '.toInt)
      else cps0

    var i = 0
    val sb = new java.lang.StringBuilder(8)
    while (i <= cps.length - NgramSize) {
      sb.setLength(0)
      sb.appendCodePoint(cps(i)).appendCodePoint(cps(i + 1)).appendCodePoint(cps(i + 2))
      val b = bucketOf(sb.toString)
      vector(b) += 1.0f
      i += 1
    }

    // float64 left-to-right norm of float32 values, as CPython computes it
    var norm = 0.0
    var j = 0
    while (j < Dimensions) { val v = vector(j).toDouble; norm += v * v; j += 1 }
    norm = math.sqrt(norm)
    if (norm > 0) {
      j = 0
      while (j < Dimensions) { vector(j) = (vector(j).toDouble / norm).toFloat; j += 1 }
    }
    vector
  }

  // ------------------------------------------------------------ sparse form
  //
  // The 384-dim embedding is ~60% zeros on typical web pages (distinct
  // trigrams << dimensions x load factor), and its nonzero values are
  // exactly (count / norm) rounded to f32. Shipping (bucket, count) pairs
  // + the norm instead of 384 dense floats cuts the verify-join shuffle
  // bytes ~2x and the dot-product loop to the nonzero intersection —
  // BITWISE-identical cosine, because:
  //   - counts are exact in f32 below 2^24 (embedder invariant), and
  //     (count / norm).toFloat here reproduces the dense element exactly;
  //   - skipped terms are products with a 0.0 factor = +0.0, and adding
  //     +0.0 to a non-negative f64 accumulator is the identity, so the
  //     ascending-index sparse accumulation equals the dense
  //     left-to-right sum bit for bit (vectors are non-negative).
  // Packing: one Long per nonzero = (bucket << 40) | count (count < 2^40;
  // the dense kernel itself loses count exactness at 2^24 long before).

  final case class SparseVec(packed: Array[Long], norm: Double)

  /** Sparse twin of [[embed]]: same buckets, same norm, exact. */
  def embedSparse(text: String): SparseVec = {
    if (text == null) return SparseVec(Array.emptyLongArray, 0.0)
    val normalized = PyText.pyStrip(text.toLowerCase(java.util.Locale.ROOT))
    if (normalized.isEmpty) return SparseVec(Array.emptyLongArray, 0.0)
    val cps0 = PyText.codePoints(normalized)
    val cps =
      if (cps0.length < NgramSize) cps0 ++ Array.fill(NgramSize - cps0.length)(' '.toInt)
      else cps0
    val counts = new Array[Int](Dimensions)
    var i = 0
    val sb = new java.lang.StringBuilder(8)
    while (i <= cps.length - NgramSize) {
      sb.setLength(0)
      sb.appendCodePoint(cps(i)).appendCodePoint(cps(i + 1)).appendCodePoint(cps(i + 2))
      counts(bucketOf(sb.toString)) += 1
      i += 1
    }
    // identical arithmetic to embed(): counts live as f32, norm is the f64
    // left-to-right sum of f64 squares of those f32 values
    var norm = 0.0
    var nz = 0
    var j = 0
    while (j < Dimensions) {
      val v = counts(j).toFloat.toDouble
      norm += v * v
      if (counts(j) != 0) nz += 1
      j += 1
    }
    norm = math.sqrt(norm)
    val packed = new Array[Long](nz)
    var k = 0
    j = 0
    while (j < Dimensions) {
      if (counts(j) != 0) { packed(k) = (j.toLong << 40) | counts(j).toLong; k += 1 }
      j += 1
    }
    SparseVec(packed, norm)
  }

  /** Exact dense reconstruction — bitwise equal to [[embed]]. */
  def sparseToDense(packed: Array[Long], norm: Double): Array[Float] = {
    val v = new Array[Float](Dimensions)
    if (norm <= 0) return v
    var i = 0
    while (i < packed.length) {
      val idx = (packed(i) >>> 40).toInt
      val cnt = packed(i) & 0xFFFFFFFFFFL
      v(idx) = (cnt.toFloat.toDouble / norm).toFloat
      i += 1
    }
    v
  }

  /** Cosine over two sparse embeddings — bitwise equal to [[cosine]] of the
    * dense reconstructions (merge-intersect in ascending bucket order).
    */
  def cosineSparse(a: Array[Long], na: Double, b: Array[Long], nb: Double): Double = {
    var dot = 0.0
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val xi = (a(i) >>> 40).toInt
      val yj = (b(j) >>> 40).toInt
      if (xi < yj) i += 1
      else if (yj < xi) j += 1
      else {
        val va = ((a(i) & 0xFFFFFFFFFFL).toFloat.toDouble / na).toFloat
        val vb = ((b(j) & 0xFFFFFFFFFFL).toFloat.toDouble / nb).toFloat
        dot += va.toDouble * vb.toDouble
        i += 1; j += 1
      }
    }
    math.max(-1.0, math.min(1.0, dot))
  }

  /** `cosine_similarity` port (`embedder.py:115-122`): float64 left-to-right
    * dot of (float32-valued) normalized vectors, clamped to [-1, 1].
    */
  def cosine(left: Array[Float], right: Array[Float]): Double = {
    require(left.length == right.length, "Vectors must have the same size")
    var dot = 0.0
    var i = 0
    while (i < left.length) { dot += left(i).toDouble * right(i).toDouble; i += 1 }
    math.max(-1.0, math.min(1.0, dot))
  }
}
