package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native Catalyst expression: the 64-bit SimHash of a token array in
  * ONE fused per-row pass.
  *
  * The signature is row-local (bit b is the sign of Σ±1 over the
  * tokens' hash bits), so the composed form — explode(tokens) →
  * xxhash64 → groupBy(doc).agg(64 sign-sums) → bit reassembly — pays
  * an explode, a shuffle of every token row, and a 64-column aggregate
  * for something each row can compute alone. This expression hashes
  * each token once (same xxhash64/seed-42 as the builtin, so
  * signatures are identical to the aggregate form) and folds the 64
  * counters in a primitive array: zero shuffle, zero intermediate
  * rows — the difference between a token-count-sized exchange and none
  * at 100 TB.
  *
  * Ties (counter == 0) produce a 0 bit, matching the aggregate form's
  * `sum > 0` test. Two documented edge divergences from the composed
  * form (unreachable via TextFunctions.tokens, which yields non-null,
  * non-empty-or-filtered arrays): an EMPTY token array yields
  * signature 0 where explode dropped the doc (Dedup.simhashSignatures
  * filters size > 0 to preserve the old row set), and NULL array
  * elements are SKIPPED where the composed form hashed them as the
  * seed value — skipping is the defensible semantic (a null token
  * carries no content).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  /** One pass: hash every token once, fold 64 sign counters. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(j), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(in: Any): Any =
    compute(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
