package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expression: the full m-sub-space product-quantizer
  * encode of a dense vector in ONE fused pass.
  *
  * The composable form (per sub-space: an array of `codes` score
  * expressions, each a vecDot against a literal centroid, then
  * array_position∘array_min) is fine at runtime but builds an
  * expression TREE of m × codes × O(subDim-literal) nodes — ~2000
  * nodes at (m=8, codes=16): several SECONDS of analyzer + optimizer +
  * whole-stage-codegen work per query, paid again for every plan that
  * embeds the encoder. This expression is O(1) tree size (the
  * codebooks ride along as a reference object, not as literals) and
  * compiles to one tight loop: m · codes · subDim multiply-adds per
  * row, zero allocation beyond the m-slot output.
  *
  * Bit-compat: scores are computed EXACTLY as the composed form did —
  * dot accumulated in ascending index order, |c|² pre-summed
  * left-to-right at build time, score = −2.0·dot + |c|², argmin by
  * strict < (ties keep the LOWEST code, matching
  * array_position-of-array_min) — so encoded codes, and therefore the
  * q358 golden, are unchanged.
  *
  * Divergence on malformed input (documented, unreachable from the
  * fit/encode pipelines, which construct fixed-dim vectors): a NULL
  * element or a length ≠ m·subDim returns NULL, where the composed
  * form produced per-sub-space NULL score poisoning.
  */
case class PqCodes(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "pq_codes"

  @transient private lazy val m: Int = codebooks.length
  @transient private lazy val subDim: Int = codebooks.head.head.length
  // [m][codes*subDim] row-major centroids + [m][codes] pre-summed norms
  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map(_.flatten.toArray).toArray
  @transient private lazy val cn2: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum).toArray).toArray

  def compute(vRaw: ArrayData): Any = {
    val n = vRaw.numElements()
    if (n != m * subDim) return null
    var i = 0
    while (i < n) { if (vRaw.isNullAt(i)) return null; i += 1 }
    val out = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = flat(s)
      val norms = cn2(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      var cOff = 0
      while (c < norms.length) {
        var dot = 0.0
        var j = 0
        while (j < subDim) {
          dot += vRaw.getDouble(off + j) * book(cOff + j)
          j += 1
        }
        val d = -2.0 * dot + norms(c)
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep lowest code
        c += 1
        cOff += subDim
      }
      out(s) = best
      off += subDim
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(in: Any): Any =
    compute(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($in);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  def pqCodes(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqCodes(
      ColumnBridge.expression(vec.cast("array<double>")), codebooks))
}
