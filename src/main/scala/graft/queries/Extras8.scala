package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.RowIndexer

/** Round-4 surface, part 4: the remaining join-shape family (full
  * outer, null-safe), by-name union with schema evolution, distributed
  * stable row indexing, and the custom Generator (UDTF) SQL surface.
  */
object Extras8 extends QueryPack {

  // --------------------------------------------------------------- q128
  /** FULL OUTER join — customers capped at key 500 vs per-customer order
    * counts, so both null sides are exercised: customers without orders
    * (right-null) and order-owners above the cap (left-null). Equi-key
    * full outer plans as a SortMergeJoin; both sides shuffle on the key
    * (no broadcast form exists for full outer in Spark — correct at any
    * scale). */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val c = t("customer").filter(col("c_custkey") <= 500)
      .select(col("c_custkey"), col("c_name"))
    val o = t("orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_orders"))
      .orderBy(col("custkey"))
  }

  private val q128Sql =
    """WITH c AS (
         SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 500),
       o AS (
         SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
       SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_orders
       FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
       ORDER BY custkey"""

  // --------------------------------------------------------------- q129
  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — NULL keys
    * match each other instead of vanishing, the semantics CDC and
    * dimension-conformance joins need. Spark plans `<=>` as a hashable
    * equi-key (EqualNullSafe is a join key, not a post-filter), so this
    * stays a hash/merge join, not a nested loop. */
  private def q129(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val l = t("customer")
      .groupBy(expr("nullif(c_nationkey % 5, 2)").as("k"))
      .agg(count(lit(1)).as("n_cust"))
    val r = t("supplier")
      .groupBy(expr("nullif(s_nationkey % 5, 2)").as("k2"))
      .agg(count(lit(1)).as("n_supp"))
    l.join(r, col("k") <=> col("k2"))
      .select(col("k"), col("n_cust"), col("n_supp"))
      .orderBy(asc_nulls_first("k"))
  }

  private val q129Sql =
    """WITH l AS (
         SELECT nullif(c_nationkey % 5, 2) AS k, count(*) AS n_cust
         FROM customer GROUP BY 1),
       r AS (
         SELECT nullif(s_nationkey % 5, 2) AS k2, count(*) AS n_supp
         FROM supplier GROUP BY 1)
       SELECT k, n_cust, n_supp
       FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2
       ORDER BY k NULLS FIRST"""

  // --------------------------------------------------------------- q130
  /** unionByName(allowMissingColumns) — schema-evolution union: the two
    * sides differ in column order AND the supplier side lacks `name`;
    * matching is by name with nulls for the missing column (positional
    * union would mis-align silently). DuckDB's UNION ALL BY NAME is the
    * exact oracle twin. */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val a = t("customer").select(col("c_custkey").as("id"),
      col("c_name").as("name"), lit("customer").as("src"))
    val b = t("supplier").select(lit("supplier").as("src"),
      col("s_suppkey").as("id"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy(col("src"), col("id"))
  }

  private val q130Sql =
    """SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
       UNION ALL BY NAME
       SELECT 'supplier' AS src, s_suppkey AS id FROM supplier
       ORDER BY src, id"""

  // --------------------------------------------------------------- q131
  /** Distributed stable row index — contiguous 0-based ids in doc_id
    * order WITHOUT the single-partition global-window bottleneck: range
    * repartition + local sort + zipWithIndex (see RowIndexer). The
    * oracle is the thing the naive plan computes, row_number() - 1. */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents").select(col("doc_id"), col("source"))
    RowIndexer.stableIndex(d, Seq(col("doc_id")))
      .select(col("doc_id"), col("source"), col("idx"))
      .orderBy(col("doc_id"))
  }

  private val q131Sql =
    """SELECT doc_id, source,
              row_number() OVER (ORDER BY doc_id) - 1 AS idx
       FROM documents ORDER BY doc_id"""

  // --------------------------------------------------------------- q132
  /** Custom Generator (UDTF) from SQL — `LATERAL VIEW chunk_split(text,
    * 7)` fans each document out to its 7-word chunks through graft's
    * native Generator expression (GenerateExec, streamed row-at-a-time;
    * see ChunkSplit). */
  private def q132(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    GraftFunctions.register(s)
    s.sql(
      """SELECT doc_id, c.pos, c.chunk
         FROM documents LATERAL VIEW chunk_split(text, 7) c AS pos, chunk""")
      .orderBy(col("doc_id"), col("pos"))
  }

  private val q132Sql =
    """WITH w AS (
         SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       c AS (
         SELECT doc_id, CAST(i AS INT) AS pos,
                array_to_string(ws[(i*7+1):(i*7+7)], ' ') AS chunk
         FROM w, unnest(range(CAST(ceil(len(ws) / 7.0) AS BIGINT))) AS t(i))
       SELECT doc_id, pos, chunk FROM c ORDER BY doc_id, pos"""

  override def queries: Map[String, QueryFn] = Map(
    "q128_full_outer"    -> q128 _,
    "q129_nullsafe_join" -> q129 _,
    "q130_union_by_name" -> q130 _,
    "q131_row_index"     -> q131 _,
    "q132_chunk_udtf"    -> q132 _)

  override def oracles: Map[String, String] = Map(
    "q128_full_outer"    -> q128Sql,
    "q129_nullsafe_join" -> q129Sql,
    "q130_union_by_name" -> q130Sql,
    "q131_row_index"     -> q131Sql,
    "q132_chunk_udtf"    -> q132Sql)
}
