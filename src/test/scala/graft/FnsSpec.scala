package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.HashingEmbedder
import graft.functions.Fns

/** Column-function parity: the codegen CosineF32 expression vs the HOF
  * twin vs the kernel, bit-for-bit.
  */
class FnsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("CosineF32 expression == HOF chain == kernel cosine, bitwise") {
    import spark.implicits._
    val texts = Seq(
      ("hello world this is a document", "hello world this is a document"),
      ("hello world this is a document", "hello world this was a document"),
      ("alpha beta gamma", "delta epsilon zeta"),
      ("пример текста на русском", "пример текста на сербском"),
      ("", "x"))
    val df = texts.map { case (a, b) =>
      (HashingEmbedder.embed(a), HashingEmbedder.embed(b))
    }.toDF("va", "vb")
    val rows = df.select(
      Fns.cosineCol(col("va"), col("vb")).as("expr"),
      Fns.cosineHof(col("va"), col("vb")).as("hof")).collect()
    texts.zipWithIndex.foreach { case ((a, b), i) =>
      val want = HashingEmbedder.cosine(HashingEmbedder.embed(a), HashingEmbedder.embed(b))
      assert(java.lang.Double.doubleToRawLongBits(rows(i).getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(want), s"expr case $i")
      assert(java.lang.Double.doubleToRawLongBits(rows(i).getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(want), s"hof case $i")
    }
  }

  test("CosineF32 null/codegen paths") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f)))).toDF("a", "b")
    val out = df.select(Fns.cosineCol(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).isNullAt(0))
    // interpreted path (eval without codegen)
    val v = graft.functions.CosineF32(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(0.6f, 0.8f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(0.6f, 0.8f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))).eval(null)
    assert(math.abs(v.asInstanceOf[Double] - 1.0) < 1e-7)
  }

  test("detectLanguage column expr matches kernel on varied samples") {
    import spark.implicits._
    val samples = Seq("hello world", "пример текста", "ovo je čudno", "", "12345",
      "ово је ћирилица", "текст ыыы", "touché café")
    val got = samples.toDF("text")
      .select(Fns.detectLanguage(col("text"), lit("")).as("l"))
      .collect().map(_.getString(0))
    samples.zip(got).foreach { case (s, l) =>
      assert(l == graft.core.LangDetect.detect(s), s"sample '$s'")
    }
  }

  test("hamming column == kernel hamming") {
    import spark.implicits._
    val pairs = Seq((0L, -1L), (5L, 5L), (Long.MinValue, Long.MaxValue), (12345L, 54321L))
    val got = pairs.toDF("a", "b")
      .select(Fns.hammingCol(col("a"), col("b"))).collect().map(_.getInt(0))
    pairs.zip(got).foreach { case ((a, b), h) =>
      assert(h == graft.core.MinHash.hamming(a, b))
    }
  }
}
