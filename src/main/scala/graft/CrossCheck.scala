package graft

import java.util.Base64
import graft.core._

/** Ad-hoc cross-check CLI over the kernel's public surface.
  *
  * Reads TSV lines `op \t b64(payload)` on stdin and writes one result line
  * per input: `b64(result)`. Used to diff the Scala kernel against the
  * reference implementation on arbitrary fuzzed inputs (see tools/fuzz_kernel.py).
  *
  * ops: extract | canon | urlhash | domain | lang | embed (hex f32le) | fp (hex)
  */
object CrossCheck {
  def main(args: Array[String]): Unit = {
    val dec = Base64.getDecoder
    val enc = Base64.getEncoder
    def b64(s: String) = enc.encodeToString(s.getBytes("UTF-8"))
    scala.io.Source.stdin.getLines().foreach { line =>
      if (line.nonEmpty) {
        val t = line.indexOf('\t')
        val op = line.substring(0, t)
        val payload = new String(dec.decode(line.substring(t + 1)), "UTF-8")
        val out = op match {
          case "extract" => b64(HtmlText.htmlToText(payload))
          case "canon"   => b64(UrlCanon.canonicalize(payload))
          case "urlhash" => UrlCanon.urlHash(payload)
          case "domain"  => b64(UrlCanon.extractDomain(payload))
          case "lang"    => LangDetect.detect(payload)
          case "embed" =>
            val v = HashingEmbedder.embed(payload)
            val bb = java.nio.ByteBuffer.allocate(v.length * 4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            v.foreach(bb.putFloat)
            bb.array().map(b => f"${b & 0xff}%02x").mkString
          case "fp" => f"${TextStats.fingerprint(payload)}%016x"
          case other => sys.error(s"unknown op $other")
        }
        println(out)
      }
    }
  }
}
