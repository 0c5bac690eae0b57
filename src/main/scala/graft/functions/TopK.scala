package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded-heap top-k aggregate — per-group top-k WITHOUT the
  * window-function shape.
  *
  * `row_number().over(partitionBy(g).orderBy(v))` (q13) sorts EVERY
  * group's full contents to keep k rows; this Aggregator keeps a k-entry
  * bound in each partial buffer, so the shuffle moves at most k entries
  * per group per map partition and nothing is ever fully sorted — the
  * classic O(n log k) vs O(n log n) trade, and at 100 TB the difference
  * between shuffling k·parts rows and shuffling the table.
  *
  * IN = (ord, payload): ranked by ord DESC, ties broken by payload ASC
  * so results are deterministic and engine-independent. BUF/OUT are
  * sorted k-lists; merge is a bounded sorted-merge (associative and
  * commutative — shuffle-safe like any built-in agg).
  */
class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord = Ordering.by[(Double, Long), (Double, Long)] {
    case (v, id) => (-v, id)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (b.length == k && ord.lteq(b.last, in)) b // below the current floor
    else {
      // the buffer is already sorted: O(k) positional insert, no re-sort
      val pos = b.indexWhere(e => ord.gt(e, in))
      val at = if (pos < 0) b.length else pos
      val inserted = (b.take(at) :+ in) ++ b.drop(at)
      if (inserted.length > k) inserted.take(k) else inserted
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
