package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{HashingEmbedder, HtmlText, LangDetect}
import graft.operators.{DedupConfig, DedupPipeline}
import graft.sources.PagesGen

/** Pages generator invariants + pipeline recall at (small) scale against
  * the exact all-pairs oracle.
  */
class PagesGenSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("pages table holds the per-row extraction invariant byte-for-byte") {
    val pages = PagesGen.generate(spark, nDocs = 400, nDomains = 50, seed = 7L)
    val rows = pages.select("url", "html", "text", "lang").collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      val html = new String(r.getAs[Array[Byte]]("html"), "UTF-8")
      assert(HtmlText.htmlToText(html) == r.getString(2), s"extract mismatch at ${r.getString(0)}")
      assert(LangDetect.detect(r.getString(2)) == r.getString(3))
    }
    // urls unique; some domain skew exists (hot domain has > 2x fair share)
    assert(rows.map(_.getString(0)).distinct.length == 400)
    val domains = rows.map(r => r.getString(0).split("/")(2))
    val hot = domains.groupBy(identity).map(_._2.length).max
    assert(hot > 2 * 400 / 50, s"expected Zipf skew, hottest=$hot")
  }

  test("generator is deterministic") {
    val a = PagesGen.generate(spark, 200, seed = 11L).select("url", "text").collect()
    val b = PagesGen.generate(spark, 200, seed = 11L).select("url", "text").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val c = PagesGen.generate(spark, 200, seed = 12L).select("text").collect()
    assert(!c.map(_.toString).sorted.sameElements(b.map(r => r.getString(1)).sorted))
  }

  test("LSH pipeline reaches >=0.99 dup-pair recall vs exact oracle at 2k docs") {
    val n = 2000
    val pages = PagesGen.generate(spark, n, nDomains = 100, seed = 42L)
      .select("url", "warc_ts", "text").cache()
    // exact oracle edges: all-pairs cosine >= 0.90 on the kernel embedder
    val docs = pages.collect().map(r => (r.getString(0), r.getString(2)))
    val vecs = docs.map { case (u, t) => u -> HashingEmbedder.embed(t) }
    val oracleEdges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (i <- vecs.indices; j <- (i + 1) until vecs.length)
      if (HashingEmbedder.cosine(vecs(i)._2, vecs(j)._2) >= 0.90)
        oracleEdges += ((vecs(i)._1, vecs(j)._1))
    assert(oracleEdges.nonEmpty, "corpus produced no duplicate pairs")

    val out = DedupPipeline.run(spark, pages, DedupConfig())
      .select("url", "component").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val hit = oracleEdges.count { case (a, b) =>
      out.get(a).exists(c => out.get(b).contains(c))
    }
    val recall = hit.toDouble / oracleEdges.size
    info(s"oracle pairs=${oracleEdges.size} co-clustered=$hit recall=$recall")
    assert(recall >= 0.99, s"recall $recall below gate")
    pages.unpersist()
  }
}
