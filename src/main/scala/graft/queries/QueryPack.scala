package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each entry pairs a Spark implementation with (optionally) an ANSI-SQL
  * oracle the driver runs in DuckDB over the same parquet tables
  * (CORRECTNESS gate, see the repo contract in SparkEntry). Column names
  * and row ordering must match between the two sides: the driver sorts
  * columns by name before hashing values, so every computed column is
  * aliased identically in both, and every query ends in a deterministic
  * ORDER BY.
  */
trait QueryPack {
  type QueryFn = (SparkSession, String) => DataFrame

  def queries: Map[String, QueryFn]

  /** DuckDB-runnable oracle SQL per query; omit for ops that SQL can't
    * express (the driver then records a weaker rows-only check). */
  def oracles: Map[String, String]
}
