package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared kernel for [[CosineSparse]] — called from both interpreted eval
  * and the generated code (a static call keeps the codegen body tiny and
  * the loop JIT-friendly). Bitwise-equal to the dense reference cosine:
  * see `graft.core.HashingEmbedder.cosineSparse`.
  */
object CosineSparseKernel {
  def cosine(a: ArrayData, na: Double, b: ArrayData, nb: Double): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    var dot = 0.0
    var i = 0
    var j = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      val xi = (x >>> 40).toInt
      val yj = (y >>> 40).toInt
      if (xi < yj) i += 1
      else if (yj < xi) j += 1
      else {
        val va = ((x & 0xFFFFFFFFFFL).toFloat.toDouble / na).toFloat
        val vb = ((y & 0xFFFFFFFFFFL).toFloat.toDouble / nb).toFloat
        dot += va.toDouble * vb.toDouble
        i += 1; j += 1
      }
    }
    math.max(-1.0, math.min(1.0, dot))
  }
}

/** Codegen'd cosine over two SPARSE embeddings, each a
  * struct(packed: array<bigint>, norm: double) with packed = (bucket<<40 |
  * count) in ascending bucket order (`HashingEmbedder.embedSparse`).
  *
  * Why sparse in the verify-join hot path: the wide payload shuffled into
  * the verify join drops from 384 dense floats (~1.5 KB) to the nonzero
  * (bucket, count) pairs (~2.5x fewer bytes on typical pages), and the
  * dot-product loop runs over the nonzero intersection instead of all 384
  * lanes — while staying BITWISE-equal to the dense reference cosine
  * (non-negative vectors: skipped zero products add exactly +0.0).
  */
case class CosineSparse(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[InternalRow]
    val b = r.asInstanceOf[InternalRow]
    java.lang.Double.valueOf(CosineSparseKernel.cosine(
      a.getArray(0), a.getDouble(1), b.getArray(0), b.getDouble(1)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.CosineSparseKernel.cosine(
         |  $a.getArray(0), $a.getDouble(1), $b.getArray(0), $b.getDouble(1));
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSparse =
    copy(left = l, right = r)
}

object CosineSparse {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSparse(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
