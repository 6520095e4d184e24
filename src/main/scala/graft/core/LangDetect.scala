package graft.core

/** Script/marker-heuristic language id for ru/sr/en/unknown.
  *
  * Port of `detect_language` (`/root/reference/src/news_recap/ingestion/language.py:7-39`).
  * Also exposed as a pure Catalyst column expression in
  * [[graft.functions.Fns.detectLanguage]] (rlike chain — codegen'd, no UDF).
  */
object LangDetect {
  private val Cyrillic = "[\\u0400-\\u04FF]".r
  private val Latin = "[A-Za-z]".r
  private val SrMarkers = "[љњђћџЈЊЂЋЏčćžšđČĆŽŠĐ]".r
  private val RuMarkers = "[ыэёЫЭЁъЪ]".r

  def detect(text: String, title: String = ""): String = {
    val sample = PyText.pyStrip(title + " " + text)
    if (sample.isEmpty) return "unknown"
    val hasCyr = Cyrillic.findFirstIn(sample).isDefined
    val hasLat = Latin.findFirstIn(sample).isDefined
    val hasSr = SrMarkers.findFirstIn(sample).isDefined
    if (hasCyr) {
      if (hasSr) "sr"
      else "ru" // mixed Cyrillic w/o strong markers defaults to ru
    } else if (hasLat) {
      if (hasSr) "sr" else "en"
    } else "unknown"
  }
}
