package graft.core

import java.util.regex.Pattern

/** Deterministic boilerplate-stripping text extraction.
  *
  * Port of the reference's canonical extractor semantics
  * (`/root/reference/src/news_recap/ingestion/cleaning.py:11-65`):
  *   1. drop `<script>`/`<style>` elements including content
  *   2. replace every remaining tag with one space
  *   3. HTML5 entity unescape
  *   4. collapse whitespace runs to single spaces
  *   5. strip
  * plus the content/summary choice + full-content inference + truncation of
  * `clean_article_text` (`cleaning.py:26-53`).
  *
  * This is the per-row invariant surface: `extract(html) == text` must hold
  * byte-for-byte for every url in the pages table.
  */
object HtmlText {

  private val ScriptStyle = Pattern.compile(
    "<(script|style)\\b[^>]*>.*?</\\1>",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL | Pattern.UNICODE_CHARACTER_CLASS)
  private val Tag = Pattern.compile("<[^>]+>")
  private val Ws = Pattern.compile("[" + PyText.WsClass + "]+")

  /** `html_to_text` port — the four-step normalize. */
  def htmlToText(rawHtml: String): String = {
    if (rawHtml == null || rawHtml.isEmpty) return ""
    val noScripts = ScriptStyle.matcher(rawHtml).replaceAll(" ")
    val stripped = Tag.matcher(noScripts).replaceAll(" ")
    val unescaped = Entities.unescape(stripped)
    val normalized = Ws.matcher(unescaped).replaceAll(" ")
    PyText.pyStrip(normalized)
  }

  /** Output of `cleanArticleText` (mirrors `CleanedText`, `cleaning.py:16-23`). */
  final case class Cleaned(
      text: String,
      isTruncated: Boolean,
      isFullContent: Boolean,
      needsEnrichment: Boolean)

  /** `clean_article_text` port: prefer content over summary, infer
    * full-content, truncate to `maxChars` code points with rstrip.
    */
  def cleanArticleText(
      contentHtml: Option[String],
      summaryHtml: Option[String],
      maxChars: Int,
      fullContentMinChars: Int = 700): Cleaned = {
    val contentText = htmlToText(contentHtml.getOrElse(""))
    val summaryText = htmlToText(summaryHtml.getOrElse(""))

    var chosen = if (contentText.nonEmpty) contentText else summaryText
    var isFull = contentText.nonEmpty && PyText.pyLen(contentText) >= fullContentMinChars
    if (!isFull && contentText.nonEmpty && summaryText.nonEmpty)
      isFull = PyText.pyLen(contentText) >= PyText.pyLen(summaryText) + 200

    var truncated = false
    if (PyText.pyLen(chosen) > maxChars) {
      chosen = PyText.pyRstrip(PyText.pySlice(chosen, maxChars))
      truncated = true
    }
    Cleaned(chosen, truncated, isFull, needsEnrichment = !isFull)
  }
}
