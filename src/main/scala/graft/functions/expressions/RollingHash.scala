package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Karp-Rabin polynomial fingerprint
  * h = fold((h·base + codepoint) mod P) over a string, in one pass.
  *
  * The composable form — `aggregate(transform(sequence(1, length), i ->
  * ascii(substr(s, i, 1))), ...)` — is O(n²) per row: every substr(i,1)
  * re-scans the UTF8 prefix, which measured 33 s for 5000 docs at
  * sf0.1. This expression iterates codepoints once (O(n)), matching
  * the DuckDB oracle's `ascii(substring(t,i,1))` semantics exactly
  * (Unicode codepoints, not UTF-16 units or bytes).
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  def compute(s: UTF8String): Long = {
    var h = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      h = (h * base + it.nextInt()) % mod
    }
    h
  }

  override protected def nullSafeEval(in: Any): Any =
    compute(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingHash", this, classOf[RollingHash].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def rollingHash(c: Column, base: Long = 131L,
                  mod: Long = MinHashSignature.P): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), base, mod))
}
