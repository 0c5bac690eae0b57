package graft.etl

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Data-layout scale story beyond directory partitioning
  * (PartitionedWriteSpec): range-clustering rows on the filter column at
  * write time makes parquet min/max stats selective, so the reader skips
  * whole row groups/files for a time-slice query instead of decoding
  * everything. Asserted via the scan's numOutputRows metric: the
  * clustered layout must surface a fraction of the rows the shuffled
  * layout surfaces for the same pushed filter.
  *
  * The clustering column is a DATE derived from the timestamp: Spark
  * shows TIMESTAMP_NTZ predicates under PushedFilters but does not
  * convert them into parquet row-group predicates (verified here — NTZ
  * stats exist in the footer and are ignored), so a layout keyed on the
  * raw timestamp silently loses ALL skipping. Deriving a DATE (or epoch
  * int) clustering key is the at-scale fix.
  */
class RangeClusteredWriteSpec extends GraftTestBase {

  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    // execute THIS df's own plan (count() would plan a different,
    // column-pruned query whose metrics live elsewhere)
    df.collect()
    val scans = df.queryExecution.executedPlan.collectWithSubqueries {
      case s: FileSourceScanExec => s
    }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("range-clustered write lets min/max stats skip most of a time-slice scan") {
    val li = graft.Tables(spark, sf001)("lineitem")
      .withColumn("l_ship_day", col("l_shipdate").cast("date"))
    val total = li.count()
    val clusteredDir = java.nio.file.Files
      .createTempDirectory("graft_rc_clustered").toString
    val shuffledDir = java.nio.file.Files
      .createTempDirectory("graft_rc_shuffled").toString

    // clustered: ranges of l_ship_day land in disjoint files
    li.repartitionByRange(8, col("l_ship_day"))
      .sortWithinPartitions("l_ship_day")
      .write.mode("overwrite").parquet(clusteredDir)
    // baseline: same 8 files, dates scattered across all of them
    li.repartition(8)
      .write.mode("overwrite").parquet(shuffledDir)

    val slice = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("l_ship_day") >= lit("1995-07-01").cast("date") &&
                col("l_ship_day") < lit("1996-01-01").cast("date"))
    val clustered = slice(spark.read.parquet(clusteredDir))
    val shuffled  = slice(spark.read.parquet(shuffledDir))

    assert(clustered.count() == shuffled.count(), "same query result")
    val clusteredRead = scanRows(clustered)
    val shuffledRead  = scanRows(shuffled)
    // scattered layout: every file's min/max spans the slice -> no
    // skipping -> the scan surfaces ~all rows. Clustered: only the
    // files whose range intersects the slice are decoded.
    assert(shuffledRead >= (total * 0.9).toLong,
      s"baseline unexpectedly pruned: $shuffledRead of $total")
    assert(clusteredRead <= shuffledRead / 2,
      s"clustering did not prune: clustered=$clusteredRead shuffled=$shuffledRead")
  }
}
