package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dense-vector dot product over two
  * array<double> columns, as a tight codegen'd loop.
  *
  * The composable form (VectorFunctions.dot = aggregate∘zip_with)
  * allocates an intermediate product array per row and walks generic
  * ArrayData through two higher-order evaluators; this expression
  * generates ONE fused loop with no allocation — the hot-path variant
  * for pair-scoring joins (cosine top-k, near-dup) where the dot runs
  * millions of times. Accumulation order is the same sequential fold,
  * so results are bit-identical to the composed form and the DuckDB
  * oracle.
  *
  * Input contract: array<double> (builders cast float arrays up front).
  * Null if either side is null (nullIntolerant); mismatched lengths
  * raise — vectors in one table share a dimension, and failing loudly
  * beats a silently-truncated dot.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_dot: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: dimension mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Registry builder: casts both sides to array<double>. */
  def fromAny(l: Expression, r: Expression): DotProduct =
    DotProduct(Cast(l, ArrayType(DoubleType)), Cast(r, ArrayType(DoubleType)))

  /** Column surface: float arrays are cast to double up front (same
    * promotion as VectorFunctions). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
