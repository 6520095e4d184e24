package graft.core

import java.security.MessageDigest

/** External-id derivation + timestamp parsing ports (SURVEY §2.2 P9/P10;
  * reference `ingestion/sources/rss.py:793-835`).
  */
object ExternalId {

  private def sha1Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(40)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** CPython `json.dumps(value, ensure_ascii=True)` string-escape. */
  def pyJsonString(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c0 if c0 < 0x20 || c0 > 0x7e => sb.append(f"\\u${c0.toInt}%04x")
        case c0 => sb.append(c0)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  /** `_build_external_id` port: guid present -> sha1(feed)[:10] + ":" +
    * guid; else "generated:" + sha1 of the sorted-key ensure-ascii JSON of
    * {feed_url, link, raw_published_at, title}.
    */
  def build(feedUrl: String, guid: Option[String], link: String, title: String,
            rawPublishedAt: Option[String]): String = {
    val g = guid.map(PyText.pyStrip).getOrElse("")
    if (g.nonEmpty) sha1Hex(feedUrl).substring(0, 10) + ":" + g
    else {
      // json.dumps(..., sort_keys=True) — keys in sorted order, ", "/": "
      // separators
      val raw = "{" + Seq(
        "feed_url" -> feedUrl,
        "link" -> link,
        "raw_published_at" -> PyText.pyStrip(rawPublishedAt.getOrElse("")),
        "title" -> title,
      ).map { case (k, v) => pyJsonString(k) + ": " + pyJsonString(v) }
        .mkString(", ") + "}"
      "generated:" + sha1Hex(raw)
    }
  }

  /** `_parse_published_at` port (P9): RFC-2822 first, then ISO-8601;
    * naive -> UTC; unparseable -> epoch. (RFC-2822 coverage is the common
    * `EEE, dd MMM yyyy HH:mm:ss Z/zone` shapes.)
    */
  def parsePublishedAt(raw: String): java.time.Instant = {
    val epoch = java.time.Instant.EPOCH
    if (raw == null) return epoch
    val s = PyText.pyStrip(raw)
    if (s.isEmpty) return epoch
    try {
      return java.time.ZonedDateTime
        .parse(s, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME).toInstant
    } catch { case _: Exception => }
    try { // RFC-2822 with numeric zone / GMT
      val f = java.time.format.DateTimeFormatter.ofPattern(
        "EEE, d MMM yyyy HH:mm:ss Z", java.util.Locale.US)
      return java.time.ZonedDateTime.parse(s, f).toInstant
    } catch { case _: Exception => }
    try { // ISO-8601 with offset
      return java.time.OffsetDateTime.parse(s).toInstant
    } catch { case _: Exception => }
    try { // ISO-8601 naive -> UTC
      return java.time.LocalDateTime.parse(s).atOffset(java.time.ZoneOffset.UTC).toInstant
    } catch { case _: Exception => }
    epoch
  }
}
