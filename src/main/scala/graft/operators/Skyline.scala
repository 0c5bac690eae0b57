package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated by any other row —
  * no other row is ≤ in BOTH dimensions with at least one strict.
  *
  * The naive formulation is a quadratic NOT EXISTS self-join (the
  * oracle spells it that way); at scale this runs as ONE sort instead:
  * order by (x asc, y asc) and keep a row iff its y is strictly below
  * the running minimum y of all STRICTLY-smaller x — computed with a
  * range-framed window (x asc, frame = unbounded..current) minus the
  * current x group. A row with equal-minimal x survives unless some
  * smaller-x row has y ≤ its y; ties inside the same (x) group only
  * dominate when y is strictly smaller, handled by a second per-x
  * min check.
  *
  * Cost: one global sort of the (already aggregated/deduplicated)
  * candidate set — for frontier queries the input is a per-key
  * aggregate, orders of magnitude smaller than the fact table, so the
  * single-partition window is on the REDUCED set (same trade as any
  * global top-k). For huge candidate sets, pre-filter per partition
  * first (a partition-local skyline is a superset of the global one) —
  * `skyline2D` does exactly that via a two-pass: partition-local
  * frontier, then global frontier of the survivors.
  */
object Skyline {

  /** Frontier minimizing both `xCol` and `yCol`. Input column set is
    * preserved. Two-pass: per-partition local skyline (mapPartitions-
    * free — a salted window), then exact global skyline of survivors. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // pass 1: local prune inside hash partitions — cheap superset
    val salted = df.withColumn("__p", spark_partition_id())
    val local = frontier(salted, xCol, yCol, Some("__p")).drop("__p")
    // pass 2: exact skyline over the (small) survivor set
    frontier(local, xCol, yCol, None)
  }

  private def frontier(df: DataFrame, xCol: String, yCol: String,
                       part: Option[String]): DataFrame = {
    // running min of y over all strictly-smaller x (range frame excludes
    // the current x value by backing off one unit below it — requires an
    // integral x, which frontier inputs are after aggregation/rounding)
    val wPrev = part.map(p => Window.partitionBy(p).orderBy(col(xCol)))
      .getOrElse(Window.orderBy(col(xCol)))
      .rangeBetween(Window.unboundedPreceding, -1)
    // min y within the same exact x value (dominance needs strict <
    // in y when x ties)
    val wSame = part.map(p => Window.partitionBy(col(p), col(xCol)))
      .getOrElse(Window.partitionBy(col(xCol)))
    df.withColumn("__minPrev", min(col(yCol)).over(wPrev))
      .withColumn("__minSame", min(col(yCol)).over(wSame))
      .filter(
        (col("__minPrev").isNull || col("__minPrev") > col(yCol)) &&
        col("__minSame") === col(yCol))
      .drop("__minPrev", "__minSame")
  }
}
