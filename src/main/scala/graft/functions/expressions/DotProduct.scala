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
  * Null semantics mirror the composed form exactly, so the
  * RewriteDotProduct optimizer rule is a pure performance rewrite:
  * `zip_with` pads mismatched lengths with null and a null product
  * poisons the fold, so mismatched lengths → NULL; any null element →
  * NULL; either side NULL → NULL. The per-element null check is only
  * emitted when an input's ArrayType admits nulls — clean
  * containsNull=false columns keep the branch-free loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  private def sideMayHaveNullElements(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => true
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads with null → null fold
    val checkNulls =
      sideMayHaveNullElements(left) || sideMayHaveNullElements(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (sideMayHaveNullElements(left) || sideMayHaveNullElements(right))
          s"""
             |if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           """.stripMargin
        else ""
      s"""
         |if ($b.numElements() != $a.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
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
