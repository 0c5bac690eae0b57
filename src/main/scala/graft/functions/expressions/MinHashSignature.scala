package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full k-permutation MinHash signature
  * of a shingle array in ONE fused pass.
  *
  * Three generations of this operator in graft, worst to best at scale:
  *   1. explode + groupBy(doc).agg(min×k): shuffles |shingles| rows;
  *   2. array_min(transform(...))×k (composable built-ins): no shuffle,
  *      but each of the k transforms materializes an intermediate array
  *      per row — measured SLOWER than (1) locally because of
  *      allocation pressure;
  *   3. this expression: per row, one loop over the shingles hashing
  *      each once (same xxhash64/seed-42 family as Spark's built-in, so
  *      signatures are identical to both earlier forms) and updating k
  *      running minima in a primitive array. Zero shuffle, zero
  *      intermediate allocation — per-doc work, embarrassingly parallel.
  *
  * The permutation family matches Dedup.coef: h_i = (a_i·x + b_i) mod P
  * over the Mersenne prime P = 2^31-1. Docs with NO shingles get
  * sentinel P in every slot (an impossible hash value, so they never
  * spuriously match — callers filter empty docs anyway).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  private val P = MinHashSignature.P
  @transient private lazy val coefA: Array[Long] =
    (0 until k).map(i => MinHashSignature.coef(i)._1).toArray
  @transient private lazy val coefB: Array[Long] =
    (0 until k).map(i => MinHashSignature.coef(i)._2).toArray

  /** One pass: hash every shingle once, fold k running minima. */
  def compute(shingles: ArrayData): ArrayData = {
    val mins = Array.fill[Long](k)(P)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      // same function+seed as Spark's xxhash64() builtin, so signatures
      // from all three operator generations agree
      val raw = XxHash64Function.hash(s, org.apache.spark.sql.types.StringType, 42L)
      val x = ((raw % P) + P) % P
      var i = 0
      while (i < k) {
        val h = (coefA(i) * x + coefB(i)) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(in: Any): Any =
    compute(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Same fused one-pass k-minima fold, but over PRE-COMPUTED base hashes
  * (array<long>) instead of hashing strings internally — the fast body
  * for alternative base-hash families (the md5 oracle twin computes its
  * hashes with built-in md5/conv, then folds here). Math is identical to
  * the composed `array_min(transform(...))×k` form it replaces: each
  * input is reduced mod P, then k affine permutations' minima are folded
  * in one loop with zero intermediate arrays. */
case class MinHashFromHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // nullable even over a non-null child: empty/all-null arrays produce
  // a NULL signature (see compute)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_from_hashes"

  private val P = MinHashSignature.P
  @transient private lazy val coefA: Array[Long] =
    (0 until k).map(i => MinHashSignature.coef(i)._1).toArray
  @transient private lazy val coefB: Array[Long] =
    (0 until k).map(i => MinHashSignature.coef(i)._2).toArray

  def compute(hashes: ArrayData): ArrayData = {
    val mins = Array.fill[Long](k)(P)
    val n = hashes.numElements()
    var contributed = false
    var j = 0
    while (j < n) {
      // null elements are skipped, matching the array_min∘transform
      // composition this claims bit-identity to (array_min ignores null
      // lambda results); without the guard a null in an array<long>
      // containsNull=true input — reachable via the SQL registration,
      // e.g. minhash_from_hashes(array(NULL, 7L), k) — would silently
      // unbox to 0L and poison every permutation's minimum.
      if (!hashes.isNullAt(j)) {
        contributed = true
        val x = ((hashes.getLong(j) % P) + P) % P
        var i = 0
        while (i < k) {
          val h = (coefA(i) * x + coefB(i)) % P
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    // Empty / all-null input → NULL signature, not the all-P sentinel:
    // the sentinel would make every such doc pair with every other at
    // est_jaccard = 1.0. (The composition yields [NULL × k] here — a
    // per-slot rather than whole-value NULL — a documented divergence
    // in the safe direction: neither form produces band rows.)
    if (contributed) new GenericArrayData(mins) else null
  }

  override protected def nullSafeEval(in: Any): Any =
    compute(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashFH", this, classOf[MinHashFromHashes].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = $ref.compute($in);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

object MinHashSignature {
  val P = 2147483647L // Mersenne prime 2^31-1 (see Dedup scaladoc)

  /** Deterministic permutation coefficients — MUST stay in lockstep with
    * Dedup.coef so all three operator generations agree. */
  def coef(i: Int): (Long, Long) = {
    val a = ((2L * i + 1L) * 2654435761L) % P
    val b = (i.toLong * 40503L + 2166136261L) % P
    (if (a == 0) 1L else a, b)
  }

  def minhashSignature(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), k))

  def minhashFromHashes(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashFromHashes(ColumnBridge.expression(hashes), k))
}
