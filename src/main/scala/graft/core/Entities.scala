package graft.core

import java.util.regex.Pattern
import scala.io.Source

/** HTML character-reference unescaping, byte-compatible with CPython's
  * `html.unescape` (the WHATWG HTML5 algorithm: full named-entity table
  * including semicolon-less legacy names with longest-prefix matching,
  * numeric refs with the windows-1252 remap of invalid code points).
  *
  * Reference usage: `/root/reference/src/news_recap/ingestion/cleaning.py:63`
  * (`html.unescape` inside `html_to_text`). The entity tables are the public
  * WHATWG data, shipped as classpath resources generated from the spec
  * (see `tools/gen_golden.py`).
  */
object Entities {

  private def resourceLines(name: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource graft/$name")
    Source.fromInputStream(in, "UTF-8").getLines()
  }

  private def decodeCps(field: String): String =
    if (field.isEmpty) ""
    else {
      val sb = new java.lang.StringBuilder
      field.split(' ').foreach(h => sb.appendCodePoint(Integer.parseInt(h, 16)))
      sb.toString
    }

  /** name (with or without trailing ';') -> replacement string */
  private val html5: Map[String, String] = resourceLines("html5_entities.tsv").map { l =>
    val t = l.indexOf('\t')
    l.substring(0, t) -> decodeCps(l.substring(t + 1))
  }.toMap

  /** numeric charrefs remapped per HTML5 (windows-1252 block etc.) */
  private val invalidCharrefs: Map[Long, String] = resourceLines("invalid_charrefs.tsv").map { l =>
    val t = l.indexOf('\t')
    java.lang.Long.parseLong(l.substring(0, t), 16) -> decodeCps(l.substring(t + 1))
  }.toMap

  /** numeric charrefs dropped entirely */
  private val invalidCodepoints: Set[Long] =
    resourceLines("invalid_codepoints.txt").filter(_.nonEmpty)
      .map(java.lang.Long.parseLong(_, 16)).toSet

  // CPython html._charref
  private val CharRef = Pattern.compile(
    "&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\\t\\n\\f <&#;]{1,32};?)")

  private def replaceCharref(s: String): String = {
    if (s.charAt(0) == '#') {
      val hex = s.length > 1 && (s.charAt(1) == 'x' || s.charAt(1) == 'X')
      var body = if (hex) s.substring(2) else s.substring(1)
      while (body.nonEmpty && body.charAt(body.length - 1) == ';')
        body = body.substring(0, body.length - 1)
      if (body.isEmpty) return "&" + s // cannot happen given the regex
      // Parse with saturation: anything beyond 0x10FFFF behaves identically.
      var num = 0L
      var i = 0
      val radix = if (hex) 16 else 10
      while (i < body.length && num <= 0x110000L) {
        num = num * radix + Character.digit(body.charAt(i), radix)
        i += 1
      }
      if (num > 0x110000L) num = 0x110001L
      invalidCharrefs.get(num) match {
        case Some(r) => r
        case None =>
          if ((num >= 0xD800L && num <= 0xDFFFL) || num > 0x10FFFFL) "�"
          else if (invalidCodepoints.contains(num)) ""
          else new String(Character.toChars(num.toInt))
      }
    } else {
      html5.get(s) match {
        case Some(r) => r
        case None =>
          // longest prefix of length >= 2 that names an entity
          var x = s.length - 1
          while (x > 1) {
            val pfx = s.substring(0, x)
            if (html5.contains(pfx)) return html5(pfx) + s.substring(x)
            x -= 1
          }
          "&" + s
      }
    }
  }

  /** CPython `html.unescape` port. */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val m = CharRef.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      sb.append(replaceCharref(m.group(1)))
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}
