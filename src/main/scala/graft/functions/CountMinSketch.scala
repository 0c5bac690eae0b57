package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import graft.functions.expressions.MinHashSignature

/** Count-Min sketch as a typed Aggregator: d rows × w buckets of Long
  * counters over PRE-HASHED items (a base hash in [0, P), e.g. the q43
  * md5 family — rand-free, so the sketch is bit-identical across runs,
  * partitionings, and engines).
  *
  * Row hashes are the same affine family the MinHash operators use
  * (MinHashSignature.coef over the Mersenne prime): row r sends item h
  * to bucket ((a_r·h + b_r) mod P) mod w. Point estimate = min over
  * rows of the bucket counter — the classic CM upper bound (never
  * under-counts; over-counts by collision mass ≈ n/w per row).
  *
  * Scale shape: the buffer is a fixed d·w Long array; reduce is O(d)
  * per item, merge is elementwise addition — exact, associative,
  * commutative, so partial sketches combine map-side like any built-in
  * agg and the shuffle carries ONE array per partition, not the items.
  * This is the sketch to keep per-key frequency tables bounded at
  * 100 TB (heavy-hitter pre-screen, join-skew detection).
  *
  * Because every step is integer arithmetic on a deterministic hash
  * family, a relational oracle can rebuild the identical sketch
  * (per-row bucket GROUP BY + min across rows) — see q325/q329.
  */
class CountMinSketch(val d: Int, val w: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val P = MinHashSignature.P
  private val coefs: Array[(Long, Long)] =
    (0 until d).map(MinHashSignature.coef).toArray

  @inline private def bucket(r: Int, h: Long): Int = {
    val (a, b) = coefs(r)
    val x = (a * h + b) % P
    (((x % w) + w) % w).toInt
  }

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < d) { buf(r * w + bucket(r, h)) += 1L; r += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMinSketch {
  /** Point-estimate from a finished sketch array (driver-side). */
  def estimate(sketch: Array[Long], d: Int, w: Int, h: Long): Long = {
    val P = MinHashSignature.P
    (0 until d).map { r =>
      val (a, b) = MinHashSignature.coef(r)
      val x = (a * h + b) % P
      sketch(r * w + (((x % w) + w) % w).toInt)
    }.min
  }
}
