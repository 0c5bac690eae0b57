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
    val t = Tables(s, dir)
    // the edge list and 12-round chain are the family-shared golden
    // intermediates (LouvainGolden) — materialized once per session
    val comm = LouvainGolden.chain(s, dir, LouvainRounds)
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
    //
    // PRECONDITION: this simpler gain template omits the self-loop
    // subtraction from the own-community term (q439's generalized
    // template carries `coalesce(sw.wself, 0)`); it matches
    // Louvain.cluster ONLY because the `c_nationkey <> s_nationkey`
    // filter guarantees a self-loop-free level-0 graph. Do not reuse
    // this template on a graph that can carry self-loops — use q439's.
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

  // --------------------------------------------------------------- q437
  /** KNESER-NEY bigram perplexity per document — the CCNet-style
    * model-based quality signal, two rungs above q278's unigram
    * surprisal and built on q376's bigram-count machinery: documents
    * whose bigram chains are IMPROBABLE under the corpus's own
    * interpolated-KN bigram model (token salad, OCR noise, shuffled
    * boilerplate) score high perplexity and get filtered.
    *
    * Model (Kneser-Ney, interpolated, one discount):
    *   D = n1/(n1 + 2·n2)                    (Ney's estimate — n1/n2 =
    *     bigram types seen once/twice; exact integer ratio)
    *   P(w2|w1) = max(c2−D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/T
    *     where c1 counts w1-started bigram OCCURRENCES, N1+(w1·) the
    *     distinct continuations, N1+(·w2) the distinct PREDECESSORS
    *     (the Kneser-Ney insight: "Francisco" is frequent but follows
    *     only "San", so its continuation probability is tiny), T the
    *     total distinct bigram types.
    *
    * Determinism: every input to a term is an exact integer; D is one
    * double division; each per-bigram nll is a FIXED expression tree
    * both engines write identically; and the per-doc sum folds the
    * (w1, w2, term) list in SORTED bigram order on both sides — the
    * q406 sorted-bucket precedent — so no float-summation order can
    * diverge (exp() stays in the output projection after round(), the
    * cross-engine exp gotcha).
    *
    * Scale shape: model tables are vocab-bounded (broadcast side);
    * the corpus shuffles once on (doc, w1, w2); scalars ride 1-row
    * cross joins. Same-corpus scoring means no OOV row exists (every
    * doc bigram is in the model by construction); a production run
    * against a reference model adds the q376 left-join floor. */
  private def q437(s: SparkSession, dir: String): DataFrame = {
    // the operator pair ([[graft.operators.KnLm]]) fit and scored on
    // the corpus itself; the query adds the source column, rounding,
    // and row order. KnLm's unseen-event coalesce branches are
    // identity on fit-corpus hits, so values are bit-identical to the
    // inner-join oracle below.
    import graft.operators.KnLm
    val d = Tables(s, dir)("documents")
    // ONE tokenize + bigram-explode pass feeds fit AND score (the
    // same-corpus fit/score shape pays the corpus scan once)
    val db = KnLm.docBigrams(d, "doc_id", "text").localCheckpoint()
    val model = KnLm.fitFromBigrams(db)
    KnLm.scoreFromBigrams(db, "doc_id", model)
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        round(col("avg_nll"), 6).as("avg_nll"),
        round(exp(col("avg_nll")), 4).as("perplexity"))
      .orderBy("doc_id")
  }

  // CTE chain shared with the q471 perplexity curriculum — OracleKn.
  private[queries] val q437Sql =
    s"""WITH ${OracleKn.perDocCtes}
       SELECT doc_id, source, n_bigrams,
              round(nllsum / n_bigrams, 6) AS avg_nll,
              round(exp(nllsum / n_bigrams), 4) AS perplexity
       FROM per_doc ORDER BY doc_id"""

  // --------------------------------------------------------------- q438
  /** SINGLE-LINK DENDROGRAM CUTS over the corpus-map plane — the
    * hierarchical companion of q415's density view: single-link at
    * threshold eps IS connected components of the eps-neighbor graph,
    * so three fixed cuts (0.005 / 0.01 / 0.02 — the coarsest being
    * q415's own eps) give the fine→coarse membership ladder without
    * the O(n²) successive-merge loop, and each cut is replayable by a
    * recursive-CTE closure (the exact merge HEIGHTS would be an
    * until-fixpoint structure — the k-core rejection rationale — but
    * fixed cuts are deterministic). The pair relation is grid-blocked
    * once at the largest cut with exact d² kept
    * ([[graft.operators.SingleLink]]); finer cuts filter it. Nesting
    * (a fine cluster never straddles two coarse ones) holds by edge-set
    * monotonicity — pinned in the spec. */
  private def q438(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SingleLink
    val p = Tables(s, dir)("embeddings").select(col("vec_id"),
      element_at(col("embedding"), 1).as("x"),
      element_at(col("embedding"), 2).as("y"))
    SingleLink.cuts(p, "vec_id", "x", "y", Seq(0.005, 0.01, 0.02))
      .select(col("id").as("vec_id"),
        col("cut0").cast("long").as("c_fine"),
        col("cut1").cast("long").as("c_mid"),
        col("cut2").cast("long").as("c_coarse"))
      .orderBy("vec_id")
  }

  private val q438Sql: String = {
    // one closure per cut: symmetric edges → transitive reachability →
    // min-id label (the q402/q415 spanning-forest convention); eps² is
    // pre-multiplied and rendered as the IEEE double Spark's
    // lit(eps*eps) uses (the q415 DECIMAL gotcha)
    def cutSql(k: Int, eps: Double): String =
      s"""e$k AS MATERIALIZED (
           SELECT a.vec_id AS ia, b.vec_id AS ib
           FROM p a JOIN p b ON a.vec_id < b.vec_id
             AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
                 <= ${OracleVec.doubleLit(eps * eps)}),
         und$k AS (SELECT ia AS a, ib AS b FROM e$k
                   UNION SELECT ib, ia FROM e$k),
         cc$k AS (
           SELECT a, b FROM und$k
           UNION
           SELECT cc$k.a, u.b FROM cc$k JOIN und$k u ON cc$k.b = u.a),
         comp$k AS MATERIALIZED (
           SELECT a AS vec_id, least(a, min(b)) AS component
           FROM cc$k GROUP BY a)"""
    val cuts = Seq(0.005, 0.01, 0.02).zipWithIndex
      .map { case (eps, k) => cutSql(k, eps) }.mkString(",\n       ")
    s"""WITH RECURSIVE
       p AS MATERIALIZED (
         SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                CAST(embedding[2] AS DOUBLE) AS y
         FROM embeddings),
       $cuts
       SELECT p.vec_id,
              CAST(coalesce(c0.component, p.vec_id) AS BIGINT) AS c_fine,
              CAST(coalesce(c1.component, p.vec_id) AS BIGINT) AS c_mid,
              CAST(coalesce(c2.component, p.vec_id) AS BIGINT) AS c_coarse
       FROM p
       LEFT JOIN comp0 c0 ON c0.vec_id = p.vec_id
       LEFT JOIN comp1 c1 ON c1.vec_id = p.vec_id
       LEFT JOIN comp2 c2 ON c2.vec_id = p.vec_id
       ORDER BY p.vec_id"""
  }

  // --------------------------------------------------------------- q439
  /** FULL two-level LOUVAIN — q436 plus Blondel et al.'s phase 2:
    * after 8 locally-dominant move rounds, every community CONTRACTS
    * to a supernode (within mass becomes the supernode's self-loop,
    * which the move gain must exclude from the own-community term —
    * it travels with the node and cancels in ΔQ), and 8 more rounds
    * run on the contracted graph. Contracted-graph modularity equals
    * the projected partition's modularity on the original graph, so Q
    * stays non-decreasing across the level boundary (LouvainSpec pins
    * Q(levels=2) >= Q(levels=1)). The oracle unrolls BOTH levels —
    * 16 round-blocks around one contraction CTE — replaying the exact
    * move order; final labels project back through the level-0 map.
    * Same exact-integer gain arithmetic as q436. */
  private val LouvainL2Rounds = 8

  private def q439(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Louvain
    val t = Tables(s, dir)
    val a = LouvainGolden.edges(s, dir)
    val comm = Louvain.clusterLevels(a, "i", "j", "w",
      rounds = LouvainL2Rounds, levels = 2)
    t("nation").join(comm, col("n_nationkey") === col("id"))
      .select(col("n_nationkey"), col("n_name"),
        col("community").cast("long").as("community"))
      .orderBy("n_nationkey")
  }

  private val q439Sql: String = {
    // generalized round template: prefix p distinguishes the two
    // levels' comm chains; selfRel carries the contracted graph's
    // self-loops (empty at level 0 — the LEFT JOIN coalesces to 0)
    def round(p: String, n: Int, aRel: String, degRel: String,
              selfRel: String): String =
      s"""dc$p$n AS MATERIALIZED (
           SELECT c, sum(k) AS d FROM comm$p$n JOIN $degRel USING (i) GROUP BY c),
         wic$p$n AS MATERIALIZED (
           SELECT $aRel.i, cj.c AS b, sum($aRel.w) AS wib
           FROM $aRel JOIN comm$p$n cj ON cj.i = $aRel.j GROUP BY 1, 2),
         cand$p$n AS MATERIALIZED (
           SELECT w.i, cm.c AS ca, w.b,
             (w.wib - (coalesce(wa.wib, 0) - coalesce(sw.wself, 0))) * m2.m2
               - $degRel.k * (db.d - da.d + $degRel.k) AS g
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
    val R = LouvainL2Rounds
    val lvlA = (0 until R)
      .map(n => round("a", n, "a", "deg", "selfw0")).mkString(",\n       ")
    val lvlB = (0 until R)
      .map(n => round("b", n, "a1", "deg1", "selfw1")).mkString(",\n       ")
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
       selfw0 AS MATERIALIZED (SELECT i, w AS wself FROM a WHERE i = j),
       m2 AS MATERIALIZED (SELECT sum(k) AS m2 FROM deg),
       comma0 AS MATERIALIZED (SELECT i, i AS c FROM deg),
       $lvlA,
       a1 AS MATERIALIZED (
         SELECT ca.c AS i, cb.c AS j, sum(a.w) AS w
         FROM a JOIN comma$R ca ON ca.i = a.i
                JOIN comma$R cb ON cb.i = a.j
         GROUP BY 1, 2),
       deg1 AS MATERIALIZED (SELECT i, sum(w) AS k FROM a1 GROUP BY i),
       selfw1 AS MATERIALIZED (SELECT i, w AS wself FROM a1 WHERE i = j),
       commb0 AS MATERIALIZED (SELECT i, i AS c FROM deg1),
       $lvlB
       SELECT n_nationkey, n_name,
              CAST(cb.c AS BIGINT) AS community
       FROM nation
       JOIN comma$R ca ON ca.i = n_nationkey
       JOIN commb$R cb ON cb.i = ca.c
       ORDER BY n_nationkey"""
  }

  // --------------------------------------------------------------- q440
  /** MinHash-LSH PARAMETER TUNER — the table an operator consults
    * before picking (rows, bands) for a 64-slot signature: banding
    * collides a pair of Jaccard j with probability
    * s(j) = 1 − (1 − j^r)^b, and for the dedup threshold t = 0.7 the
    * design cost is the S-curve's mass on the wrong sides —
    * FP = ∫₀ᵗ s(j)dj (non-dups paying exact verification),
    * FN = ∫ₜ¹ (1 − s(j))dj (true dups never candidate). Both
    * integrals as 200-step midpoint sums weighted by the corpus's
    * OWN observed pair-Jaccard mix (uniform weights here — stated in
    * the column names). Cross-engine float discipline: j^r and
    * (1−j^r)^b are INTEGER powers expanded as left-fold repeated
    * multiplication (never libm pow(), whose last ulp differs across
    * engines); the 200-term integral folds in ascending-i order via
    * the q406 list discipline on both sides. One row per (r, b)
    * factorization of 64, ranked by total error. What the table
    * actually says: (8, 8) minimizes the EQUAL-WEIGHT total
    * (0.085), while the committed default (4, 16) is the min-FN
    * choice (FN 0.0004 at FP 0.25) — the right asymmetry for dedup,
    * where a missed true duplicate is unrecoverable but a false
    * candidate only pays one cheap exact verification. Both facts
    * pinned in Round9ClosersSpec. */
  private def q440(s: SparkSession, dir: String): DataFrame = {
    val T = 0.7; val Steps = 200
    val configs = Seq((1, 64), (2, 32), (4, 16), (8, 8), (16, 4),
      (32, 2), (64, 1))
    // integer power by left-fold repeated multiplication — identical
    // IEEE sequence on both engines
    def ipow(x: org.apache.spark.sql.Column, n: Int) =
      Seq.fill(n)(x).reduce(_ * _)
    val grid = s.range(0, Steps).select(
      ((col("id").cast("double") + 0.5) / Steps).as("j"))
    val rows = configs.map { case (r, b) =>
      val sj = lit(1.0) - ipow(lit(1.0) - ipow(col("j"), r), b)
      val fpTerm = when(col("j") < T, sj).otherwise(lit(0.0)) / Steps
      val fnTerm = when(col("j") >= T, lit(1.0) - sj).otherwise(lit(0.0)) / Steps
      grid.select(col("j"), fpTerm.as("fp_t"), fnTerm.as("fn_t"))
        .agg(
          aggregate(transform(sort_array(collect_list(
            struct(col("j"), col("fp_t")))), e => e.getField("fp_t")),
            lit(0.0), (a, x) => a + x).as("fp"),
          aggregate(transform(sort_array(collect_list(
            struct(col("j"), col("fn_t")))), e => e.getField("fn_t")),
            lit(0.0), (a, x) => a + x).as("fn"))
        .select(lit(r).as("r"), lit(b).as("b"),
          round(col("fp"), 6).as("fp_mass_uniform"),
          round(col("fn"), 6).as("fn_mass_uniform"),
          round(col("fp") + col("fn"), 6).as("total_err"))
    }
    rows.reduce(_ unionByName _)
      .orderBy(col("total_err"), col("r"))
  }

  private val q440Sql: String = {
    val T = 0.7; val Steps = 200
    val configs = Seq((1, 64), (2, 32), (4, 16), (8, 8), (16, 4),
      (32, 2), (64, 1))
    def ipow(x: String, n: Int) = Seq.fill(n)(x).mkString("(", " * ", ")")
    val branches = configs.map { case (r, b) =>
      val sj = s"1.0 - ${ipow(s"(1.0 - ${ipow("j", r)})", b)}"
      s"""SELECT $r AS r, $b AS b,
            round(list_sum(list_transform(
              list({'j': j, 'v': CASE WHEN j < $T THEN ($sj) ELSE 0.0 END
                                   / $Steps} ORDER BY j),
              e -> e.v)), 6) AS fp_mass_uniform,
            round(list_sum(list_transform(
              list({'j': j, 'v': CASE WHEN j >= $T THEN 1.0 - ($sj) ELSE 0.0 END
                                   / $Steps} ORDER BY j),
              e -> e.v)), 6) AS fn_mass_uniform,
            round(list_sum(list_transform(
              list({'j': j, 'v': CASE WHEN j < $T THEN ($sj) ELSE 0.0 END
                                   / $Steps} ORDER BY j),
              e -> e.v)) +
              list_sum(list_transform(
              list({'j': j, 'v': CASE WHEN j >= $T THEN 1.0 - ($sj) ELSE 0.0 END
                                   / $Steps} ORDER BY j),
              e -> e.v)), 6) AS total_err
          FROM grid"""
    }.mkString("\n       UNION ALL\n       ")
    s"""WITH grid AS MATERIALIZED (
         SELECT (CAST(i AS DOUBLE) + 0.5) / $Steps AS j
         FROM unnest(generate_series(0, ${Steps - 1})) AS u(i))
       SELECT * FROM (
       $branches)
       ORDER BY total_err, r"""
  }

  // --------------------------------------------------------------- q441
  /** STRATIFIED EXACT-COUNT train/val/test split (80/10/10 by source)
    * — [[graft.operators.StratifiedSplit]]: per stratum the split
    * sizes are the largest-remainder apportionment of the integer
    * percentages (a 10-doc source yields exactly 8/1/1, never the
    * 10/0/0 a per-row hash split can produce), with rows filling
    * quotas in deterministic md5 order. All quota arithmetic is
    * integer (n·pct div/mod 100) — no floor(n·0.8) double hazard —
    * and the md5 rank order is the engines' shared hex-string sort,
    * so the per-doc assignment hash-matches. */
  private def q441(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.StratifiedSplit
    StratifiedSplit.assign(Tables(s, dir)("documents"), "doc_id", "source",
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .orderBy("doc_id")
  }

  private val q441Sql =
    """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       sp AS (SELECT * FROM (VALUES (0, 'train', 80), (1, 'val', 10),
                                    (2, 'test', 10)) AS t(k, split, pct)),
       q0 AS (SELECT source, n, k, split,
                (n * pct) // 100 AS floorq, (n * pct) % 100 AS rem
              FROM cnt CROSS JOIN sp),
       q1 AS (SELECT *,
                n - sum(floorq) OVER (PARTITION BY source) AS extras,
                row_number() OVER (PARTITION BY source
                  ORDER BY rem DESC, k) AS rr
              FROM q0),
       q2 AS (SELECT source, k, split,
                floorq + CASE WHEN rr <= extras THEN 1 ELSE 0 END AS quota
              FROM q1),
       q3 AS (SELECT *,
                sum(quota) OVER (PARTITION BY source ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM q2),
       ranked AS (
         SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
             ORDER BY md5('spl:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
         FROM documents)
       SELECT r.doc_id, r.source, q3.split
       FROM ranked r JOIN q3 ON q3.source = r.source
         AND r.rk > q3.cum - q3.quota AND r.rk <= q3.cum
       ORDER BY r.doc_id"""

  // --------------------------------------------------------------- q442
  /** DUPLICATE-FAMILY HIERARCHY over the TEXT near-dup graph — q438's
    * dendrogram-cut idea applied to minhash similarity instead of the
    * 2-D plane: single-link families at est-Jaccard cuts 0.2 / 0.5 /
    * 0.8 over the md5-family LSH candidate pairs (one banded pipeline
    * run; finer cuts FILTER the same materialized pair relation).
    * Estimated Jaccard is agree/16 — an exact multiple of 1/16 on
    * both engines — so the cut comparisons have no float-boundary
    * hazard. The fine→coarse family labels answer "which docs are
    * variants of the same template, and at what strength do the
    * families merge" (boilerplate audits read the 0.2 families,
    * retention policies the 0.8 ones). q26's doc_id % 5 slice keeps
    * the oracle's quadratic closure honest. */
  private def q442(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ConnectedComponents, Dedup}
    val base = Tables(s, dir)("documents")
      .filter(pmod(col("doc_id"), lit(5)) === 0)
    val pairs = Dedup.minhashDedupMd5(base, "doc_id", "text",
        threshold = 0.2)
      .localCheckpoint() // all three cuts filter this one relation
    val ids = base.select(col("doc_id"))
    Seq(("fam_loose", 0.2), ("fam_mid", 0.5), ("fam_tight", 0.8))
      .foldLeft(ids) { case (acc, (nm, cut)) =>
        val comp = ConnectedComponents.components(
          pairs.filter(col("est_jaccard") >= cut)
            .select(col("id_a"), col("id_b")),
          "id_a", "id_b")
        acc.join(comp.select(col("id").as("doc_id"), col("component")),
            Seq("doc_id"), "left")
          .withColumn(nm, coalesce(col("component"), col("doc_id")))
          .drop("component")
      }
      .select(col("doc_id"), col("fam_loose").cast("long").as("fam_loose"),
        col("fam_mid").cast("long").as("fam_mid"),
        col("fam_tight").cast("long").as("fam_tight"))
      .orderBy("doc_id")
  }

  private val q442Sql: String = {
    val P = graft.functions.expressions.MinHashSignature.P
    val sigList = (0 until 16)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val agree = (1 to 16)
      .map(i => s"CASE WHEN sig_a[$i] = sig_b[$i] THEN 1 ELSE 0 END")
      .mkString(" + ")
    val bandKey = (1 to 4)
      .map(j => s"sig[4 * t.b + $j]::VARCHAR")
      .mkString(" || ',' || ")
    def cutSql(k: Int, cut: Double): String =
      s"""ed$k AS MATERIALIZED (SELECT id_a, id_b FROM est WHERE e >= $cut),
         und$k AS (SELECT id_a AS a, id_b AS b FROM ed$k
                   UNION SELECT id_b, id_a FROM ed$k),
         cc$k AS (
           SELECT a, b FROM und$k
           UNION
           SELECT cc$k.a, u.b FROM cc$k JOIN und$k u ON cc$k.b = u.a),
         comp$k AS MATERIALIZED (
           SELECT a AS doc_id, least(a, min(b)) AS component
           FROM cc$k GROUP BY a)"""
    val cuts = Seq(0.2, 0.5, 0.8).zipWithIndex
      .map { case (c, k) => cutSql(k, c) }.mkString(",\n       ")
    s"""WITH RECURSIVE
       base AS MATERIALIZED (
         SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       d AS (
         SELECT doc_id,
           list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P) AS hx
         FROM base WHERE length(text) >= 5),
       sigs AS (SELECT doc_id, $sigList AS sig FROM d),
       bands AS MATERIALIZED (
         SELECT doc_id, sig, t.b AS band_idx, $bandKey AS band_key
         FROM sigs, unnest(generate_series(0, 3)) AS t(b)),
       prs AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
         FROM bands a JOIN bands b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
       est AS MATERIALIZED (
         SELECT id_a, id_b, ($agree) / 16.0 AS e FROM prs),
       $cuts
       SELECT base.doc_id,
              CAST(coalesce(c0.component, base.doc_id) AS BIGINT) AS fam_loose,
              CAST(coalesce(c1.component, base.doc_id) AS BIGINT) AS fam_mid,
              CAST(coalesce(c2.component, base.doc_id) AS BIGINT) AS fam_tight
       FROM base
       LEFT JOIN comp0 c0 ON c0.doc_id = base.doc_id
       LEFT JOIN comp1 c1 ON c1.doc_id = base.doc_id
       LEFT JOIN comp2 c2 ON c2.doc_id = base.doc_id
       ORDER BY base.doc_id"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q436_louvain" -> q436 _,
    "q437_kn_perplexity" -> q437 _,
    "q438_dendrogram_cuts" -> q438 _,
    "q439_louvain_levels" -> q439 _,
    "q440_lsh_tuner" -> q440 _,
    "q441_stratified_split" -> q441 _,
    "q442_dup_families" -> q442 _)

  override def oracles: Map[String, String] = Map(
    "q436_louvain" -> q436Sql,
    "q437_kn_perplexity" -> q437Sql,
    "q438_dendrogram_cuts" -> q438Sql,
    "q439_louvain_levels" -> q439Sql,
    "q440_lsh_tuner" -> q440Sql,
    "q441_stratified_split" -> q441Sql,
    "q442_dup_families" -> q442Sql)
}
