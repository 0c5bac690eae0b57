package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed stable row indexing: assign every row a contiguous global
  * id `0..n-1` in a total order, without funnelling the dataset through
  * a single-partition window.
  *
  * The naive `row_number() OVER (ORDER BY ...)` plans an empty-frame
  * global Window — Spark executes it on ONE partition, so at 100 TB one
  * task sorts (and spills) the whole table. This operator keeps the work
  * distributed:
  *
  *   1. `repartitionByRange(order)` — range partitioner samples the keys
  *      and assigns non-overlapping, ordered key ranges to partitions
  *      (one shuffle, the unavoidable one: a total order needs a global
  *      range exchange);
  *   2. `sortWithinPartitions(order)` — local sort, no further exchange;
  *   3. `zipWithIndex` — one lightweight job counts rows per partition
  *      (O(#partitions) longs to the driver, NOT data), then each
  *      partition stamps `offset + local position` map-side.
  *
  * Total cost: one range shuffle + one count pass. The same shape Spark
  * itself uses for `RDD.zipWithIndex`; here it is lifted to DataFrames
  * with the order made explicit.
  *
  * Sequence-id assignment for training corpora is the motivating use:
  * shard-stable example ids over documents (reference scope: the
  * capstone only ever numbers rows implicitly via `show()`,
  * `Capstone Project Template.ipynb` cell 11; a real pipeline needs the
  * ids materialized).
  *
  * The order columns must form a total order (no ties) for the ids to be
  * deterministic — with ties, rows within a tie-group get arbitrary but
  * still unique ids.
  */
object RowIndexer {

  /** Append a contiguous `idx` column (0-based LongType) ordered by
    * `order`. Partition count defaults to the session shuffle
    * parallelism. */
  def stableIndex(df: DataFrame, order: Seq[Column], idxCol: String = "idx",
                  numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val indexed: RDD[Row] = sorted.rdd.zipWithIndex().map {
      case (row, i) => Row.fromSeq(row.toSeq :+ i)
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(idxCol, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }

  /** Reproduce `ntile(k)`'s bucket rule from a stamped 0-based index
    * and the total row count: the first `n mod k` buckets hold
    * `⌈n/k⌉` rows, the rest `⌊n/k⌋` (SQL-standard ntile, identical in
    * Spark and DuckDB). Pure (idx, n) integer arithmetic, so swapping
    * a single-task `ntile() OVER (ORDER BY ...)` for
    * `stableIndex + ntileBucket` keeps bucket boundaries bit-identical
    * while the sort stays range-partitioned. Returns IntegerType
    * 1..k, matching Spark's ntile output type. */
  def ntileBucket(idxCol: String, n: Long, k: Int): Column = {
    import org.apache.spark.sql.functions.{col, expr, when}
    require(k >= 1, "need at least one bucket")
    val q = n / k; val r = n % k
    val head = r * (q + 1) // rows 0..head-1 fall in the ⌈n/k⌉ buckets
    (when(col(idxCol) < head, expr(s"$idxCol DIV ${q + 1}"))
      .otherwise(expr(
        s"$r + ($idxCol - $head) DIV ${math.max(q, 1L)}"))
      + 1).cast("int")
  }
}
