package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for co-located, shuffle-free joins.
  *
  * `bucketBy(n, key)` writes each table hash-partitioned on the join key
  * into n buckets registered in the catalog; a join of two tables
  * bucketed the same way needs NO exchange on either side — the planner
  * proves co-partitioning from the catalog metadata. At 100 TB this is
  * the difference between re-shuffling the fact table on every join and
  * shuffling it exactly once at write time.
  *
  * (Bucketed writes must go through saveAsTable — path-based parquet
  * loses the bucket metadata.)
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket keys. */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                   rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
