package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 pack: graph community OPTIMIZATION (q436 — the Louvain
  * optimizer whose result q429's scorer evaluates).
  */
object Extras68 extends QueryPack {

  // --------------------------------------------------------------- q436
  /** LOUVAIN COMMUNITIES of the nation trade graph — the optimizer
    * half of q429 (which scores a GIVEN partition): 12 fixed rounds of
    * locally-dominant local moves ([[graft.operators.Louvain]]). Every
    * move's gain is EXACT Long arithmetic (G = (w_ib − w_ia)·m2 −
    * k_i·(D_b − D_a + k_i), integer edge masses throughout — products
    * stay far under 2^63 at these SFs; the q429 DECIMAL note applies
    * at community masses past ~1e9), move selection is the
    * (−G, i, b)-struct minimum per touched community, and the oracle
    * UNROLLS the identical 12 rounds as CTE stages — the same
    * deterministic move order replayed relationally, so the final
    * membership hash-matches. Output: one row per nation with its
    * community label (a nationkey — the label a move adopts is the
    * target community's existing label). On this near-random trade
    * graph the optimizer lifts Q from the singleton −0.057 to a small
    * positive value, beating the region partition (≈ −0.057, q429's
    * finding that trade is NOT region-assortative) — pinned by
    * LouvainSpec. */
  private val LouvainRounds = 12

  private def q436(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Louvain
    val t = Tables(s, dir)
    val e0 = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("i"), col("s_nationkey").as("j"))
      .agg(count(lit(1)).as("c"))
    val a = e0.select(col("i"), col("j"), col("c"))
      .union(e0.select(col("j"), col("i"), col("c")))
      .groupBy("i", "j").agg(sum("c").as("w"))
      .localCheckpoint() // feeds every round of the optimizer
    val comm = Louvain.cluster(a, "i", "j", "w", rounds = LouvainRounds)
    t("nation").join(comm, col("n_nationkey") === col("id"))
      .select(col("n_nationkey"), col("n_name"),
        col("community").cast("long").as("community"))
      .orderBy("n_nationkey")
  }

  private val q436Sql: String = {
    // one CTE block per round, replaying the operator's move rule:
    // per-node best positive exact-integer gain, locally-dominant
    // selection via the (−g, i, b) struct minimum per touched
    // community, survivors applied
    def round(tIn: String, n: Int): String = {
      val pri = (rel: String) =>
        s"{'ng': -$rel.g, 'i': $rel.i, 'b': $rel.b}"
      s"""dc$n AS MATERIALIZED (
           SELECT c, sum(k) AS d FROM $tIn JOIN deg USING (i) GROUP BY c),
         wic$n AS MATERIALIZED (
           SELECT a.i, cj.c AS b, sum(a.w) AS wib
           FROM a JOIN $tIn cj ON cj.i = a.j GROUP BY 1, 2),
         cand$n AS MATERIALIZED (
           SELECT w.i, cm.c AS ca, w.b,
             (w.wib - coalesce(wa.wib, 0)) * m2.m2
               - deg.k * (db.d - da.d + deg.k) AS g
           FROM wic$n w
           JOIN comm$n cm ON cm.i = w.i AND cm.c <> w.b
           LEFT JOIN wic$n wa ON wa.i = w.i AND wa.b = cm.c
           JOIN deg ON deg.i = w.i
           JOIN dc$n db ON db.c = w.b
           JOIN dc$n da ON da.c = cm.c
           CROSS JOIN m2),
         best$n AS MATERIALIZED (
           SELECT i, ca, b, g FROM (
             SELECT *, row_number() OVER (PARTITION BY i
                         ORDER BY g DESC, b) AS rb
             FROM cand$n WHERE g > 0) WHERE rb = 1),
         tmin$n AS MATERIALIZED (
           SELECT u.tc, min(${pri("best" + n)}) AS mn
           FROM best$n, unnest([ca, b]) AS u(tc) GROUP BY 1),
         mv$n AS MATERIALIZED (
           SELECT bs.i, bs.b FROM best$n bs
           JOIN tmin$n ta ON ta.tc = bs.ca
           JOIN tmin$n tb ON tb.tc = bs.b
           WHERE {'ng': -bs.g, 'i': bs.i, 'b': bs.b} = ta.mn
             AND {'ng': -bs.g, 'i': bs.i, 'b': bs.b} = tb.mn),
         comm${n + 1} AS MATERIALIZED (
           SELECT c0.i, coalesce(mv.b, c0.c) AS c
           FROM comm$n c0 LEFT JOIN mv$n mv ON mv.i = c0.i)"""
    }
    val rounds = (0 until LouvainRounds)
      .map(n => round(s"comm$n", n)).mkString(",\n       ")
    s"""WITH e0 AS MATERIALIZED (
         SELECT c_nationkey AS i, s_nationkey AS j, count(*) AS c
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE c_nationkey <> s_nationkey
         GROUP BY 1, 2),
       a AS MATERIALIZED (
         SELECT i, j, sum(c) AS w
         FROM (SELECT i, j, c FROM e0 UNION ALL SELECT j, i, c FROM e0)
         GROUP BY 1, 2),
       deg AS MATERIALIZED (SELECT i, sum(w) AS k FROM a GROUP BY i),
       m2 AS MATERIALIZED (SELECT sum(k) AS m2 FROM deg),
       comm0 AS MATERIALIZED (SELECT i, i AS c FROM deg),
       $rounds
       SELECT n_nationkey, n_name,
              CAST(c AS BIGINT) AS community
       FROM nation JOIN comm$LouvainRounds ON i = n_nationkey
       ORDER BY n_nationkey"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q436_louvain" -> q436 _)

  override def oracles: Map[String, String] = Map(
    "q436_louvain" -> q436Sql)
}
