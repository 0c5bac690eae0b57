package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) bit interleave over 1-4 pre-scaled int dimensions.
  *
  * zvalue = bit i of dim d lands at output bit (i·n + d): points close
  * in EVERY dimension get close z-values, so range-clustering on the
  * z-value makes parquet min/max footer stats selective for filters on
  * ANY of the interleaved columns — the multi-dimensional generalization
  * of the single-column range-clustered layout (RangeClusteredWriteSpec),
  * i.e. what Delta/Iceberg expose as OPTIMIZE ZORDER BY.
  *
  * Inputs must already be scaled to [0, 2^bits) ints (ZOrder.clusterWrite
  * does the min/max normalization); NULL scales to 0 deliberately — a
  * null dimension should sort first, not poison the row's z-value.
  *
  * bits = 63/n per dimension keeps the interleave inside a positive
  * Long. Codegen evaluates children inline and calls one reference
  * method — no boxing, stays inside whole-stage codegen.
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty || children.size > 4)
      TypeCheckResult.TypeCheckFailure("interleave_bits takes 1-4 columns")
    else if (children.exists(_.dataType != IntegerType))
      TypeCheckResult.TypeCheckFailure("interleave_bits inputs must be INT")
    else TypeCheckResult.TypeCheckSuccess

  private val n = children.size
  val bitsPerDim: Int = 63 / math.max(n, 1)

  def compute(dims: Array[Int]): Long = {
    var out = 0L
    var i = 0
    while (i < bitsPerDim) {
      var d = 0
      while (d < n) {
        out |= ((dims(d).toLong >>> i) & 1L) << (i * n + d)
        d += 1
      }
      i += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val dims = new Array[Int](n)
    var d = 0
    while (d < n) {
      val v = children(d).eval(input)
      dims(d) = if (v == null) 0 else v.asInstanceOf[Int]
      d += 1
    }
    compute(dims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("interleave", this, classOf[InterleaveBits].getName)
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("dims")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val fills = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0 : ${e.value};"
    }.mkString("\n")
    ev.copy(
      code = code"""
        $childCode
        int[] $arr = new int[$n];
        $fills
        long ${ev.value} = $ref.compute($arr);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}

object InterleaveBits {
  def interleaveBits(cols: Seq[Column]): Column =
    ColumnBridge.column(InterleaveBits(cols.map(ColumnBridge.expression)))
}
