package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd cosine of two float32 vectors with the reference's arithmetic:
  * float64 left-to-right accumulation of float64 products of float32
  * elements, clamped to [-1, 1] (`recap/dedup/embedder.py:115-122`).
  *
  * This is the verify-join hot path: a `zip_with`+`aggregate` chain computes
  * the same value but materializes an intermediate 384-element array per
  * row; this expression loops directly over the two `ArrayData`s inside
  * whole-stage codegen — no allocation, no virtual calls.
  */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float> columns (construction is owned by
  // Fns.cosineCol; no SQL-facing registration, so no ExpectsInputTypes)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(math.max(-1.0, math.min(1.0, dot)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = java.lang.Math.max(-1.0, java.lang.Math.min(1.0, $dot));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineF32 =
    copy(left = l, right = r)
}

object CosineF32 {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineF32(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
