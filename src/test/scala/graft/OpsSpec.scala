package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.HashingEmbedder
import graft.operators.{Ann, TextOps}

/** ANN recall vs brute force, n-gram Jaccard vs a kernel oracle, and the
  * text ops' agreement with the pure kernel.
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  // The driver embeddings table is isotropic noise (NN cosine ~0.35) — no
  // LSH can retrieve "neighbors" that are not actually near. The meaningful
  // ANN property is recall on *planted* near neighbors (the near-dup search
  // use case): queries = corpus vectors + small noise, true NN known.
  test("LSH ANN recall@1 >= 0.9 on planted near neighbors") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val planted = emb.filter(col("vec_id") < 30).collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      val rnd = new scala.util.Random(r.getLong(0))
      val noisy = v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
      val n = math.sqrt(noisy.map(x => x.toDouble * x).sum).toFloat
      (r.getLong(0) + 1000000L, noisy.map(_ / n), r.getLong(0))
    }
    val queries = planted.map(p => (p._1, p._2)).toSeq.toDF("vec_id", "embedding")
    val lsh = Ann.lshTopK(emb, queries, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = planted.count(p => lsh.get(p._1).contains(p._3))
    info(s"planted-NN recall@1 = $hits/${planted.length}")
    assert(hits >= 27, s"recall ${hits}/30")
    // and LSH ranks candidates by the exact cosine (same scorer as brute)
    val brute = Ann.bruteForceTopK(emb, queries, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = planted.count(p => lsh.get(p._1) == brute.get(p._1))
    assert(agree >= 27, s"lsh/brute agreement $agree/30")
  }

  test("brute-force top-k matches a driver-side exact computation") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val got = Ann.bruteForceTopK(
        spark.read.parquet(s"$sf/embeddings.parquet"),
        spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 3), 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
    (0L until 3L).foreach { q =>
      val qv = emb.find(_._1 == q).get._2
      val want = emb.filter(_._1 != q)
        .map { case (id, v) => (id, HashingEmbedder.cosine(qv.map(_.toFloat), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(2).map(_._1)
      val mine = got.filter(_._1 == q).sortBy(_._2).map(_._3)
      assert(mine.sameElements(want), s"query $q: ${mine.toSeq} vs ${want.toSeq}")
    }
  }

  test("ngram Jaccard pairs match kernel-computed Jaccard on found pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 1
      (3L, "completely different words here nothing shared at all"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta")   // exact dup of 1
    ).toDF("doc_id", "text")
    val pairs = TextOps.ngramJaccardPairs(docs, n = 3, minJaccard = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    def kernelJ(a: String, b: String): Double = {
      def grams(t: String) = t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
      val (ga, gb) = (grams(a), grams(b))
      (ga intersect gb).size.toDouble / (ga union gb).size
    }
    assert(pairs.contains((1L, 4L)) && math.abs(pairs((1L, 4L)) - 1.0) < 1e-12)
    assert(pairs.contains((1L, 2L)))
    assert(math.abs(pairs((1L, 2L)) - kernelJ(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta iota")) < 1e-12)
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exactDedup groups identical texts and keeps smallest id") {
    import spark.implicits._
    val docs = Seq((10L, "aaa"), (11L, "bbb"), (12L, "aaa"), (13L, "aaa"))
      .toDF("doc_id", "text")
    val out = TextOps.exactDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val grp = out.filter(_._2 == 10L)
    assert(grp.length == 3 && grp.forall(_._3 == 3L))
    assert(out.count(_._4) == 2) // two distinct texts -> two keepers
  }

  test("Spark-side quality/token ops agree with the kernel") {
    import spark.implicits._
    val texts = Seq("The quick brown fox.", "  padded   text  here ", "word")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val full = TextOps.qualityFull(docs).collect().sortBy(_.getLong(0))
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(full(i).getInt(1) == graft.core.TextStats.wsTokenCount(t))
      assert(full(i).getInt(2) == graft.core.TextStats.bpeishTokenCount(t))
    }
  }
}
