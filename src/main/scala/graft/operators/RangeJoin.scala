package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: points joined to intervals they fall in, on a
  * shared key — without a non-equi-join cross product.
  *
  * Spark plans a raw `t BETWEEN start AND end` join as
  * BroadcastNestedLoop (or a full sort-merge band at best); at scale
  * that's |points|×|intervals| work per key. Bucketing time into
  * fixed-width buckets turns it into an EQUI-join: each interval
  * replicates to the buckets it covers (≤ len/width + 1 rows), each
  * point maps to exactly ONE bucket, so every qualifying (point,
  * interval) pair meets exactly once — no dedup needed — and only
  * same-bucket pairs are ever compared. The residual exact predicate
  * filters bucket-mates that don't truly overlap.
  */
object RangeJoin {

  /** Inner join: points p (pKey, pTime) ⨝ intervals i (iKey, [iStart,
    * iEnd)) where p.key == i.key AND iStart <= pTime < iEnd.
    * Times are timestamp columns; bucketWidth in seconds. Output: all
    * point columns + all interval columns. */
  def pointInInterval(points: DataFrame, pKey: String, pTime: String,
                      intervals: DataFrame, iKey: String,
                      iStart: String, iEnd: String,
                      bucketWidthSec: Long): DataFrame = {
    val w = bucketWidthSec * 1000000L // micros
    val p = points.withColumn("__bucket",
      floor(unix_micros(col(pTime)) / w))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(iStart)) / w),
        floor((unix_micros(col(iEnd)) - 1) / w))))
    p.join(i,
        p("__bucket") === i("__bucket") && p(pKey) === i(iKey) &&
        col(pTime) >= col(iStart) && col(pTime) < col(iEnd))
      .drop("__bucket")
  }
}
