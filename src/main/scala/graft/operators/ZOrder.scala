package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.InterleaveBits

/** Z-order (Morton-curve) clustered layout: sort-by-space-filling-curve
  * before writing so parquet min/max stats prune scans filtered on ANY
  * of the clustering columns.
  *
  * Single-column range clustering (RangeClusteredWriteSpec) is perfect
  * for one filter column and useless for the others — every file spans
  * the full range of the non-sort dimensions. Interleaving the bits of
  * all clustering keys gives every file a tight bounding box in every
  * dimension (locality degrades gracefully: k dims share 63/k bits
  * each). This is what Delta/Iceberg `OPTIMIZE ZORDER BY` does; here it
  * is plain DataFrame machinery: one stats pass, one projection, one
  * range exchange.
  *
  * Two-pass by design: pass 1 computes global min/max per column (an
  * O(cols) agg — bytes to the driver), pass 2 scales each value to
  * [0, 2^bits), interleaves (native codegen'd InterleaveBits), range
  * repartitions on the z-value and sorts within partitions. At 100 TB
  * both passes are embarrassingly parallel; the range exchange is the
  * same one any clustered write pays.
  */
object ZOrder {

  /** Write `df` z-clustered on `cols` (numeric/date columns) into
    * `numFiles` files at `path`. */
  def clusterWrite(df: DataFrame, cols: Seq[String], numFiles: Int,
                   path: String): Unit =
    zorderBy(df, cols, numFiles).write.mode("overwrite").parquet(path)

  /** The layout transform alone (for tests / composition): returns `df`
    * range-partitioned and sorted by the z-value of `cols`, original
    * schema preserved. */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    val n = cols.size
    require(n >= 1 && n <= 4, "zorder supports 1-4 columns")
    val bits = 63 / n
    val scale = (1L << bits) - 1

    // pass 1: global per-column bounds (tiny driver result)
    val aggCols = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(dcol(df, c)).as(s"min$i"), max(dcol(df, c)).as(s"max$i"))
    }
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).head()

    // pass 2: scale to [0, 2^bits), interleave, cluster
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val lo = bounds.getDouble(2 * i)
      val hi = bounds.getDouble(2 * i + 1)
      val range = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      coalesce(
        round((dcol(df, c) - lit(lo)) / lit(range) * lit(scale.toDouble))
          .cast("int"),
        lit(0))
    }
    val z = InterleaveBits.interleaveBits(scaled)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Numeric view of a clustering column: dates/timestamps via epoch
    * seconds, everything else cast to double. */
  private def dcol(df: DataFrame, c: String): Column =
    df.schema(c).dataType.typeName match {
      case "date"                      => datediff(col(c), lit("1970-01-01")).cast("double")
      case t if t.startsWith("timestamp") => unix_seconds(col(c)).cast("double")
      case _                           => col(c).cast("double")
    }
}
