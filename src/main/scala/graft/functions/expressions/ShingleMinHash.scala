package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle → k-permutation MinHash signature DIRECTLY from the
  * document string — the zero-materialization form of the scale path.
  *
  * The composed pipeline (`TextFunctions.charShingles` →
  * [[MinHashSignature]]) builds, per row, ~|text| substring COPIES, an
  * array to hold them, and an `array_distinct` pass — all garbage the
  * moment the signature is folded. Two observations let all of it
  * vanish:
  *
  *   1. duplicate shingles cannot change a MINIMUM, so the distinct
  *      step is algebraically a no-op for MinHash;
  *   2. each shingle's xxhash64 equals hashing its byte slice in
  *      place — `XXH64.hashUnsafeBytes(base, offset+start, len, 42)`
  *      over the parent string's buffer is bit-identical to
  *      `xxhash64(substring(text, i, n))`, because UTF8String
  *      substrings are exactly those bytes.
  *
  * So this expression walks the char-start byte offsets once (one int
  * array per row — the only allocation besides the k-slot output),
  * hashes each n-char window in place, and folds the k affine minima
  * inline. Signatures are BIT-IDENTICAL to the composed form (pinned
  * in DedupSpec); at 100 TB the difference is ~|corpus| transient
  * strings never allocated, never GC'd, never distinct-hashed.
  *
  * Docs shorter than `shingleLen` chars get sentinel P in every slot,
  * matching the composed form's behavior on an empty shingle array
  * (callers filter them; they can never spuriously match).
  */
case class ShingleMinHash(child: Expression, shingleLen: Int, k: Int)
    extends UnaryExpression {

  require(shingleLen > 0, s"shingleLen must be positive, got $shingleLen")
  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_minhash"

  private val P = MinHashSignature.P
  @transient private lazy val coefA: Array[Long] =
    (0 until k).map(i => MinHashSignature.coef(i)._1).toArray
  @transient private lazy val coefB: Array[Long] =
    (0 until k).map(i => MinHashSignature.coef(i)._2).toArray

  def compute(s: UTF8String): ArrayData = {
    val mins = Array.fill[Long](k)(P)
    val nBytes = s.numBytes()
    // char-start byte offsets (one pass; starts(c) = byte pos of char c)
    val nChars = s.numChars()
    if (nChars >= shingleLen) {
      val starts = new Array[Int](nChars + 1)
      var b = 0
      var c = 0
      while (b < nBytes) {
        starts(c) = b
        b += UTF8String.numBytesForFirstByte(s.getByte(b))
        c += 1
      }
      starts(nChars) = nBytes
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val nWin = nChars - shingleLen + 1
      var i = 0
      while (i < nWin) {
        // same bytes, same algorithm, same seed as xxhash64(substring):
        // bit-identical to the composed charShingles→MinHashSignature path
        val raw = XXH64.hashUnsafeBytes(
          base, off + starts(i), starts(i + shingleLen) - starts(i), 42L)
        val x = ((raw % P) + P) % P
        var j = 0
        while (j < k) {
          val h = (coefA(j) * x + coefB(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(in: Any): Any =
    compute(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleMinhash", this, classOf[ShingleMinHash].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

object ShingleMinHash {
  def shingleMinhash(text: Column, shingleLen: Int, k: Int): Column =
    ColumnBridge.column(
      ShingleMinHash(ColumnBridge.expression(text), shingleLen, k))
}
