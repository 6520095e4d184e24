package graft.core

/** Longest-common-substring via generalized suffix array + Kasai LCP.
  *
  * Used as the near-exact-overlap precision gate on candidate pairs (the
  * north rule's "suffix-array-based longest-common-substring checks"): a
  * candidate whose LCS covers a large fraction of the shorter document is a
  * near-exact duplicate even when token-level mutations depress cosine.
  *
  * O(n log n) doubling suffix-array construction; fine for per-pair document
  * sizes (<= ~24k code points per pair at the 12000-char truncation cap).
  */
object SuffixLcs {

  /** Suffix array over an int sequence (code points + sentinel). */
  private def suffixArray(s: Array[Int]): Array[Int] = {
    val n = s.length
    val sa = Array.tabulate(n)(identity)
    var rank = s.clone()
    val tmp = new Array[Int](n)
    var k = 1
    val ord = new Ordering[Int] {
      var len = 1
      def compare(a: Int, b: Int): Int = {
        if (rank(a) != rank(b)) return Integer.compare(rank(a), rank(b))
        val ra = if (a + len < n) rank(a + len) else -1
        val rb = if (b + len < n) rank(b + len) else -1
        Integer.compare(ra, rb)
      }
    }
    while (k < n) {
      ord.len = k
      scala.util.Sorting.stableSort(sa, (a: Int, b: Int) => ord.compare(a, b) < 0)
      tmp(sa(0)) = 0
      var i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (ord.compare(sa(i - 1), sa(i)) < 0) 1 else 0)
        i += 1
      }
      System.arraycopy(tmp, 0, rank, 0, n)
      if (rank(sa(n - 1)) == n - 1) k = n // all distinct, done
      k <<= 1
    }
    sa
  }

  /** Kasai LCP array: lcp(i) = common prefix of sa(i) and sa(i-1). */
  private def kasai(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** Length (in code points) of the longest common substring of a and b. */
  def lcsLength(a: String, b: String): Int = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0
    val ca = PyText.codePoints(a)
    val cb = PyText.codePoints(b)
    // shift code points by +2 so the two sentinels (1, 0) sort below all
    // chars and the out-of-range rank (-1) stays strictly smallest
    val s = new Array[Int](ca.length + cb.length + 2)
    var ci = 0
    while (ci < ca.length) { s(ci) = ca(ci) + 2; ci += 1 }
    s(ca.length) = 1
    ci = 0
    while (ci < cb.length) { s(ca.length + 1 + ci) = cb(ci) + 2; ci += 1 }
    s(s.length - 1) = 0
    val sa = suffixArray(s)
    val lcp = kasai(s, sa)
    val boundary = ca.length // index of the -2 sentinel
    var best = 0
    var i = 1
    while (i < s.length) {
      val fromA = sa(i) < boundary
      val prevFromA = sa(i - 1) < boundary
      if (fromA != prevFromA && lcp(i) > best) best = lcp(i)
      i += 1
    }
    best
  }

  /** LCS length over the shorter document's length, in [0,1]. */
  def lcsRatio(a: String, b: String): Double = {
    val la = PyText.pyLen(a); val lb = PyText.pyLen(b)
    val m = math.min(la, lb)
    if (m == 0) 0.0 else lcsLength(a, b).toDouble / m
  }
}
