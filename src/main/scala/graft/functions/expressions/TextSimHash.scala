package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused whitespace-tokenize → 64-bit SimHash DIRECTLY from the
  * document string — the [[ShingleMinHash]] treatment applied to the
  * SimHash path: the composed form (`TextFunctions.tokens` →
  * [[SimHash64]]) materializes a token ARRAY per row (one UTF8String
  * copy per token) only to hash each element once and discard it all.
  * This expression walks the bytes once and hashes each token span in
  * place — zero per-token allocation.
  *
  * Tokenization is BIT-EXACT to `split(trim(text), "\\s+")` (what
  * `TextFunctions.tokens` evaluates), including its edges:
  *   - `trim` strips ASCII spaces (0x20) only, both ends;
  *   - the separator class is Java's `\s` = [ \t\n\x0B\f\r] — all
  *     ASCII, so byte-level scanning is UTF-8-safe (multi-byte chars
  *     never collide with ASCII values);
  *   - a leading separator yields a leading EMPTY token, a trailing
  *     separator a trailing one, and the all-space/empty string the
  *     single-element [""] — Java split with limit -1 keeps them, and
  *     each empty token votes with the hash of the empty string,
  *     exactly like the composed form.
  * Voting and packing mirror [[SimHash64]]: xxhash64/seed-42 per token,
  * ±1 per bit, ties (count == 0) pack as 0. Pinned bit-for-bit against
  * the composed form on real documents and adversarial whitespace in
  * DedupSpec + PropertiesSpec.
  */
case class TextSimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_simhash"

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): Long = {
    val counts = new Array[Int](64)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()

    def vote(start: Int, end: Int): Unit = {
      // same bytes, same algorithm+seed as xxhash64(token)
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }

    // trim(text): ASCII space only, both ends
    var lo = 0
    var hi = nb
    while (lo < hi && s.getByte(lo) == ' ') lo += 1
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1

    if (lo == hi) vote(lo, lo) // split("") == [""] — one empty token
    else {
      if (isWs(s.getByte(lo))) vote(lo, lo) // leading empty token
      var p = lo
      while (p < hi) {
        while (p < hi && isWs(s.getByte(p))) p += 1
        if (p < hi) {
          val st = p
          while (p < hi && !isWs(s.getByte(p))) p += 1
          vote(st, p)
        } else vote(hi, hi) // string ended inside a separator run
      }
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
    compute(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textSimhash", this, classOf[TextSimHash].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextSimHash =
    copy(child = newChild)
}

object TextSimHash {
  def textSimhash(text: Column): Column =
    ColumnBridge.column(TextSimHash(ColumnBridge.expression(text)))
}
