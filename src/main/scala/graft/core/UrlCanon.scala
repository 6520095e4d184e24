package graft.core

import java.security.MessageDigest

/** URL canonicalization + hashing.
  *
  * Port of `canonicalize_url` / `url_hash` / `extract_domain`
  * (`/root/reference/src/news_recap/ingestion/cleaning.py:68-105`), which sit
  * on CPython's `urllib.parse.urlparse`/`urlunparse`. The subset of urlparse
  * semantics those functions exercise is reimplemented here (scheme
  * detection, netloc split, params/query/fragment split, unparse rules),
  * including 3.11's removal of embedded tab/CR/LF.
  */
object UrlCanon {

  /** Parsed form matching urlparse's 6-tuple. */
  final case class Parts(
      scheme: String, netloc: String, path: String,
      params: String, query: String, fragment: String)

  /** urllib.parse.uses_params — schemes whose last path segment may carry
    * `;params` (CPython data).
    */
  private val usesParams = Set(
    "", "ftp", "hdl", "prospero", "http", "imap", "https", "shttp", "rtsp",
    "rtspu", "sip", "sips", "mms", "sftp", "tel")

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  /** CPython 3.11 `urlparse` port (no percent-decoding; none is done there). */
  def urlparse(rawUrl: String): Parts = {
    // urlsplit lstrips C0-control-or-space (trailing is preserved on
    // purpose in CPython), then removes all tab/CR/LF bytes
    var url = rawUrl
    var lo = 0
    while (lo < url.length && url.charAt(lo) <= ' ') lo += 1
    url = url.substring(lo).filter(c => c != '\t' && c != '\r' && c != '\n')
    var scheme = ""

    val colon = url.indexOf(':')
    if (colon > 0) {
      val cand = url.substring(0, colon)
      val c0 = cand.charAt(0)
      val isAlpha = (c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')
      if (isAlpha && cand.forall(isSchemeChar)) {
        scheme = cand.toLowerCase(java.util.Locale.ROOT)
        url = url.substring(colon + 1)
      }
    }

    var netloc = ""
    if (url.startsWith("//")) {
      var i = 2
      while (i < url.length && url.charAt(i) != '/' && url.charAt(i) != '?' && url.charAt(i) != '#') i += 1
      netloc = url.substring(2, i)
      url = url.substring(i)
    }

    var fragment = ""
    val hash = url.indexOf('#')
    if (hash >= 0) { fragment = url.substring(hash + 1); url = url.substring(0, hash) }

    var query = ""
    val q = url.indexOf('?')
    if (q >= 0) { query = url.substring(q + 1); url = url.substring(0, q) }

    // urlparse (vs urlsplit) additionally splits ;params off the last
    // segment, but only for schemes in urllib.parse.uses_params
    var params = ""
    if (usesParams.contains(scheme) && url.contains(';')) {
      val i =
        if (url.contains('/')) url.indexOf(';', url.lastIndexOf('/'))
        else url.indexOf(';')
      if (i >= 0) { params = url.substring(i + 1); url = url.substring(0, i) }
    }

    Parts(scheme, netloc, url, params, query, fragment)
  }

  /** Schemes CPython treats as carrying a netloc (urllib.parse.uses_netloc). */
  private val usesNetloc = Set(
    "", "ftp", "http", "gopher", "nntp", "telnet", "imap", "wais", "file",
    "mms", "https", "shttp", "snews", "prospero", "rtsp", "rtspu", "rsync",
    "svn", "svn+ssh", "sftp", "nfs", "git", "git+ssh", "ws", "wss",
    "itms-services")

  /** CPython 3.11 `urlunparse` port for the shapes we produce. */
  def urlunparse(p: Parts): String = {
    var url = p.path
    if (p.params.nonEmpty) url = url + ";" + p.params
    if (p.netloc.nonEmpty || (p.scheme.nonEmpty && usesNetloc.contains(p.scheme)) ||
      url.startsWith("//")) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + p.netloc + url
    }
    if (p.scheme.nonEmpty) url = p.scheme + ":" + url
    if (p.query.nonEmpty) url = url + "?" + p.query
    if (p.fragment.nonEmpty) url = url + "#" + p.fragment
    url
  }

  /** `canonicalize_url` port (`cleaning.py:68-92`). */
  def canonicalize(url: String): String = {
    val parsed = urlparse(PyText.pyStrip(url))
    val scheme = (if (parsed.scheme.nonEmpty) parsed.scheme else "https")
    var netloc = parsed.netloc.toLowerCase(java.util.Locale.ROOT)
    if (netloc.endsWith(":80") && scheme == "http") netloc = netloc.dropRight(3)
    if (netloc.endsWith(":443") && scheme == "https") netloc = netloc.dropRight(4)

    val path = if (parsed.path.nonEmpty) parsed.path else "/"
    val normalizedPath = path.replaceAll("/{2,}", "/")
    val normalizedQuery = parsed.query.split("&", -1).filter(_.nonEmpty).sorted.mkString("&")

    urlunparse(Parts(scheme, netloc, normalizedPath, "", normalizedQuery, ""))
  }

  /** `url_hash` port: sha1 hex of the canonical URL, UTF-8. */
  def urlHash(url: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    val d = md.digest(canonicalize(url).getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(40)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** `extract_domain` port: lowercased netloc of the raw URL, else "unknown". */
  def extractDomain(url: String): String = {
    val n = urlparse(url).netloc.toLowerCase(java.util.Locale.ROOT)
    if (n.nonEmpty) n else "unknown"
  }
}
