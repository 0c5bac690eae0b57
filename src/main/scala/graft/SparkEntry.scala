package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Airports, Curation, Curation2, Curation3, DedupOracles, Events, Events2, Extras, Extras2, Extras3, Extras4, Extras5, Extras6, Extras7, Extras8, Extras9, Extras10, Extras11, Extras12, Extras13, Extras14, Extras15, Extras16, Extras17, Extras18, Extras19, Extras20, Extras21, Extras22, Extras23, Extras24, Extras25, Extras26, Extras27, Extras28, Extras29, Extras30, Extras31, Extras32, Extras33, Extras34, Extras35, Extras36, Extras37, Extras38, Extras39, Extras40, Extras41, Extras42, Extras43, Extras44, Extras45, Extras46, Extras47, Extras48, Extras49, Extras50, Extras51, Extras52, Extras53, Extras54, Extras55, Extras56, Extras57, Extras58, Extras59, Extras60, Extras61, Extras62, Extras63, Extras64, Extras65, Extras66, Extras67, Extras68, Extras69, Extras70, Extras71, Extras72, Extras73, Extras74, Extras75, Extras76, Media, QueryPack, Relational, Relational2, Relational3, Sql, Sql2, Text, Text2, Vectors, Vectors2}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryPack: each entry is one implemented operator
  * family from SURVEY.md §2, paired (where SQL can express it) with a
  * DuckDB oracle over the same parquet tables. Column names and row order
  * match between the Spark plan and the oracle SQL by construction (see
  * QueryPack scaladoc).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(Relational, Relational2, Relational3, Text, Text2, Vectors, Vectors2,
        Events, Events2, Media, Sql, Extras, Extras2, Extras3, Extras4,
        Extras5, Extras6, Extras7, Extras8, Extras9, Extras10, Extras11,
        Extras12, Extras13, Extras14, Extras15, Extras16, Extras17, Extras18, Extras19, Extras20, Extras21, Extras22, Extras23, Extras24, Extras25, Extras26, Extras27, Extras28, Extras29, Extras30, Extras31, Extras32, Extras33, Extras34, Extras35, Extras36, Extras37, Extras38, Extras39, Extras40, Extras41, Extras42, Extras43, Extras44, Extras45, Extras46, Extras47, Extras48, Extras49, Extras50, Extras51, Extras52, Extras53, Extras54, Extras55, Extras56, Extras57, Extras58, Extras59, Extras60, Extras61, Extras62, Extras63, Extras64, Extras65, Extras66, Extras67, Extras68, Extras69, Extras70, Extras71, Extras72, Extras73, Extras74, Extras75, Extras76, DedupOracles,
        Curation, Curation2, Curation3, Sql2, Airports)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q03_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
