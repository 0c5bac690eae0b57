package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 10: serialization functions (from_csv /
  * to_json / to_csv), the Spark 4.1 approx_top_k sketch family, typed
  * joinWith, and the SQL UNPIVOT clause.
  */
object Extras14 extends QueryPack {

  // --------------------------------------------------------------- q158
  /** from_csv round trip: orders serialized to CSV lines and parsed
    * back through a typed schema — the "CSV column inside a table"
    * shape (embedded exports, message payloads). Parsing is a
    * codegen'd expression, no UDF. */
  private def q158(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders").filter(col("o_orderkey") < 200)
    val lines = o.select(col("o_orderkey"),
      concat_ws(",", col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority")).as("line"))
    lines.select(col("o_orderkey"), col("line"),
        from_csv(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k BIGINT, status STRING, prio STRING"),
          Map.empty[String, String]).as("p"))
      .select(col("o_orderkey"),
        col("p.k").as("k"), col("p.status").as("status"),
        col("p.prio").as("prio"))
      .orderBy("o_orderkey")
  }

  private val q158Sql =
    """SELECT o_orderkey, o_orderkey AS k, o_orderstatus AS status,
              o_orderpriority AS prio
       FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"""

  // --------------------------------------------------------------- q159
  /** to_json / to_csv serialization: struct columns rendered to
    * transport strings. Integer/string fields only — float formatting
    * is engine-specific and has no place in a byte-compared contract. */
  private def q159(s: SparkSession, dir: String): DataFrame = {
    val n = Tables(s, dir)("nation")
    n.select(col("n_nationkey"),
        to_json(struct(col("n_nationkey").as("k"), col("n_name").as("n")))
          .as("js"),
        to_csv(struct(col("n_nationkey"), col("n_name"))).as("cs"))
      .orderBy("n_nationkey")
  }

  private val q159Sql =
    """SELECT n_nationkey,
              '{"k":' || n_nationkey || ',"n":"' || n_name || '"}' AS js,
              n_nationkey || ',' || n_name AS cs
       FROM nation ORDER BY n_nationkey"""

  // --------------------------------------------------------------- q160
  /** approx_top_k (Spark 4.1 DataSketches frequent-items) in the exact
    * regime: maxItemsTracked far above the true cardinality makes the
    * sketch exact, so the heavy-hitter list hash-matches a plain
    * GROUP BY oracle — same honesty pattern as q39/q102/q116. The
    * sketch's value at 100 TB: fixed-size mergeable state instead of a
    * full (key → count) shuffle. */
  private def q160(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    e.agg(expr("approx_top_k(event_type, 3, 100)").as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item").as("event_type"), col("t.count").as("n"))
      .orderBy(desc("n"), col("event_type"))
  }

  private val q160Sql =
    """SELECT event_type, count(*) AS n FROM events
       GROUP BY 1 ORDER BY n DESC, event_type LIMIT 3"""

  // --------------------------------------------------------------- q161
  /** Typed joinWith: Dataset pair join keeping both sides as whole
    * structs (the type-safe enrichment shape), flattened back to
    * columns for the oracle compare. */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val t = Tables(s, dir)
    val nat = t("nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = t("region").select(col("r_regionkey"), col("r_name"))
    nat.joinWith(reg, col("n_regionkey") === col("r_regionkey"))
      .select(col("_1.n_nationkey").as("n_nationkey"),
        col("_1.n_name").as("n_name"), col("_2.r_name").as("r_name"))
      .orderBy("n_nationkey")
  }

  private val q161Sql =
    """SELECT n_nationkey, n_name, r_name
       FROM nation JOIN region ON n_regionkey = r_regionkey
       ORDER BY n_nationkey"""

  // --------------------------------------------------------------- q162
  /** SQL UNPIVOT clause: wide per-status counts folded back to rows
    * (the inverse of q119's SQL PIVOT), exercising the parser-level
    * clause rather than the Dataset API melt of q57. */
  private def q162(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql(
      """SELECT * FROM (
           SELECT
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f_cnt,
             sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o_cnt,
             sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS p_cnt
           FROM orders)
         UNPIVOT (cnt FOR status IN (f_cnt AS `F`, o_cnt AS `O`, p_cnt AS `P`))
         ORDER BY status""")
  }

  private val q162Sql =
    """SELECT CASE x WHEN 1 THEN 'F' WHEN 2 THEN 'O' ELSE 'P' END AS status,
              CAST(sum(CASE x WHEN 1 THEN (o_orderstatus = 'F')::INT
                              WHEN 2 THEN (o_orderstatus = 'O')::INT
                              ELSE (o_orderstatus = 'P')::INT END) AS BIGINT)
                AS cnt
       FROM orders, (SELECT unnest([1, 2, 3]) AS x)
       GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q158_from_csv"     -> q158 _,
    "q159_serialize"    -> q159 _,
    "q160_approx_top_k" -> q160 _,
    "q161_joinwith"     -> q161 _,
    "q162_sql_unpivot"  -> q162 _)

  override def oracles: Map[String, String] = Map(
    "q158_from_csv"     -> q158Sql,
    "q159_serialize"    -> q159Sql,
    "q160_approx_top_k" -> q160Sql,
    "q161_joinwith"     -> q161Sql,
    "q162_sql_unpivot"  -> q162Sql)
}
