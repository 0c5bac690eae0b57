package graft.queries

/** Shared DuckDB oracle fragments for the Louvain family — the
  * generalized round template (q439's self-loop-aware gain, extended
  * with the Reichardt–Bornholdt γ multipliers) and the nation trade
  * graph prefix, so the γ-ladder / refinement oracles don't drift from
  * the committed q436/q439 chains the way the vector fragments drifted
  * before OracleVec consolidated them.
  */
private[queries] object OracleLouvain {

  /** One Louvain round as a CTE block chain comm{p}{n} → comm{p}{n+1}.
    *
    * Replays [[graft.operators.Louvain.cluster]]'s move rule exactly:
    * per-node best positive gain (order g desc, b asc), locally
    * dominant selection via the (−g, i, b) struct minimum per touched
    * community, survivors applied. The gain carries the γ rational as
    * two integer multipliers — G = den·(w_ib − w_ia)·m2 − num·k·(D_b −
    * D_a + k) — and the self-loop subtraction (selfRel may be an empty
    * relation; the LEFT JOIN coalesces to 0), so the template is safe
    * on contracted graphs and at any γ.
    *
    * @param p      chain prefix distinguishing parallel ladders
    * @param n      round index (reads comm{p}{n}, emits comm{p}{n+1})
    * @param aRel   symmetrized ordered-pair edge CTE (i, j, w)
    * @param degRel static per-node degree CTE (i, k)
    * @param selfRel self-loop CTE (i, wself), possibly empty
    */
  def roundSql(p: String, n: Int, aRel: String, degRel: String,
               selfRel: String, gammaNum: Long = 1L,
               gammaDen: Long = 1L): String =
    s"""dc$p$n AS MATERIALIZED (
         SELECT c, sum(k) AS d FROM comm$p$n JOIN $degRel USING (i) GROUP BY c),
       wic$p$n AS MATERIALIZED (
         SELECT $aRel.i, cj.c AS b, sum($aRel.w) AS wib
         FROM $aRel JOIN comm$p$n cj ON cj.i = $aRel.j GROUP BY 1, 2),
       cand$p$n AS MATERIALIZED (
         SELECT w.i, cm.c AS ca, w.b,
           $gammaDen * (w.wib - (coalesce(wa.wib, 0) - coalesce(sw.wself, 0)))
             * m2.m2
             - $gammaNum * $degRel.k * (db.d - da.d + $degRel.k) AS g
         FROM wic$p$n w
         JOIN comm$p$n cm ON cm.i = w.i AND cm.c <> w.b
         LEFT JOIN wic$p$n wa ON wa.i = w.i AND wa.b = cm.c
         LEFT JOIN $selfRel sw ON sw.i = w.i
         JOIN $degRel ON $degRel.i = w.i
         JOIN dc$p$n db ON db.c = w.b
         JOIN dc$p$n da ON da.c = cm.c
         CROSS JOIN m2),
       best$p$n AS MATERIALIZED (
         SELECT i, ca, b, g FROM (
           SELECT *, row_number() OVER (PARTITION BY i
                       ORDER BY g DESC, b) AS rb
           FROM cand$p$n WHERE g > 0) WHERE rb = 1),
       tmin$p$n AS MATERIALIZED (
         SELECT u.tc, min({'ng': -g, 'i': i, 'b': b}) AS mn
         FROM best$p$n, unnest([ca, b]) AS u(tc) GROUP BY 1),
       mv$p$n AS MATERIALIZED (
         SELECT bs.i, bs.b FROM best$p$n bs
         JOIN tmin$p$n ta ON ta.tc = bs.ca
         JOIN tmin$p$n tb ON tb.tc = bs.b
         WHERE {'ng': -bs.g, 'i': bs.i, 'b': bs.b} = ta.mn
           AND {'ng': -bs.g, 'i': bs.i, 'b': bs.b} = tb.mn),
       comm$p${n + 1} AS MATERIALIZED (
         SELECT c0.i, coalesce(mv.b, c0.c) AS c
         FROM comm$p$n c0 LEFT JOIN mv$p$n mv ON mv.i = c0.i)"""

  /** A full fixed-round chain: comm{p}0 (singletons from degRel) plus
    * `rounds` round blocks. Emits comm{p}{rounds} as the final state. */
  def chainSql(p: String, rounds: Int, aRel: String, degRel: String,
               selfRel: String, gammaNum: Long = 1L,
               gammaDen: Long = 1L): String = {
    val blocks = (0 until rounds)
      .map(n => roundSql(p, n, aRel, degRel, selfRel, gammaNum, gammaDen))
      .mkString(",\n       ")
    s"""comm${p}0 AS MATERIALIZED (SELECT i, i AS c FROM $degRel),
       $blocks"""
  }

  /** The q436 nation trade graph prefix: e0 → symmetrized a, deg,
    * selfw0 (empty — the <> filter guarantees no self-loops), m2. */
  val tradeGraphPrefix: String =
    """e0 AS MATERIALIZED (
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
       selfw0 AS MATERIALIZED (SELECT i, w AS wself FROM a WHERE i = j),
       m2 AS MATERIALIZED (SELECT sum(k) AS m2 FROM deg)"""
}
