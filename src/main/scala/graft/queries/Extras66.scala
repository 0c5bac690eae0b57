package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{ConnectedComponents, Dbscan, Pca, Similarity}

/** Round-8 pack, part 9: the corpus-map family — grid-blocked DBSCAN
  * (q415), ROUGE-2 clipped-recall contamination (q416), the
  * cluster-aware split leakage audit (q417), the PCA spectrum probe /
  * outliers / top-2 deflation (q418-q420), the end-to-end projected
  * corpus map (q421), and its ARI external validation (q427).
  */
object Extras66 extends QueryPack {

  // --------------------------------------------------------------- q415
  /** Grid-blocked DBSCAN over the 2-D corpus map — density modes +
    * named noise points over the first two embedding coordinates (the
    * projection-stage stand-in). All algorithm and scale reasoning
    * lives on [[graft.operators.Dbscan]]; the oracle replays the same
    * definition QUADRATICALLY (exact, so the blocked plan must agree
    * bit-for-bit — the blocking's zero-false-negative claim is itself
    * under test), with the q65 recursive-CTE closure for the core
    * components. Distance math is double-widened floats compared as
    * dist² <= eps² — identical IEEE ops on both engines, no rounding
    * needed. eps=0.02/minPts=4 give a 269/80/151 core/border/noise
    * mix with 19 clusters at sf0.01. */
  private def q415(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir)("embeddings")
      .select(col("vec_id"),
        element_at(col("embedding"), 1).as("x"),
        element_at(col("embedding"), 2).as("y"))
    Dbscan.cluster(p, "vec_id", "x", "y", eps = 0.02, minPts = 4)
      .orderBy("vec_id")
  }

  /** eps² rendered as the IEEE double Spark's `lit(eps * eps)` uses —
    * DuckDB would evaluate `0.025*0.025` in exact DECIMAL, one ulp off
    * the double product, so the product is pre-multiplied here and
    * rendered via [[OracleVec.doubleLit]]. */
  private def epsSqSql(eps: Double): String = OracleVec.doubleLit(eps * eps)

  /** The DBSCAN oracle chain (quadratic pairs → degrees → cores →
    * recursive closure → border assignment), over a preceding CTE
    * `p(vec_id, x, y)` — the SQL twin of [[graft.operators.Dbscan]],
    * shared by q415/q421/q427. Ends with CTEs `pts`, `core_cl`,
    * `bord`, `cores` for the caller's final SELECT. */
  private def dbscanChainSql(eps: Double, minPts: Int): String =
    s"""pr AS MATERIALIZED (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM p a JOIN p b ON a.vec_id < b.vec_id
           AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
               <= ${epsSqSql(eps)}),
       deg AS (SELECT v, count(*) AS d
               FROM (SELECT id_a AS v FROM pr UNION ALL SELECT id_b FROM pr)
               GROUP BY 1),
       pts AS MATERIALIZED (
         SELECT p.vec_id, coalesce(d, 0) + 1 AS n_nb
         FROM p LEFT JOIN deg ON deg.v = p.vec_id),
       cores AS MATERIALIZED (SELECT vec_id FROM pts WHERE n_nb >= $minPts),
       ce AS MATERIALIZED (
         SELECT id_a, id_b FROM pr
         JOIN cores ca ON ca.vec_id = pr.id_a
         JOIN cores cb ON cb.vec_id = pr.id_b),
       und AS MATERIALIZED (
         SELECT id_a AS a, id_b AS b FROM ce
         UNION SELECT id_b, id_a FROM ce),
       cc AS (SELECT a, b FROM und
              UNION SELECT cc.a, u.b FROM cc JOIN und u ON cc.b = u.a),
       comp AS (SELECT a AS vec_id, least(a, min(b)) AS component
                FROM cc GROUP BY a),
       core_cl AS MATERIALIZED (
         SELECT c.vec_id, coalesce(component, c.vec_id) AS cluster
         FROM cores c LEFT JOIN comp ON comp.vec_id = c.vec_id),
       adj AS (SELECT id_a AS v, id_b AS u FROM pr
               UNION ALL SELECT id_b, id_a FROM pr),
       bord AS (
         SELECT adj.v AS vec_id, min(k.cluster) AS cluster
         FROM adj JOIN core_cl k ON k.vec_id = adj.u
         WHERE adj.v NOT IN (SELECT vec_id FROM cores)
         GROUP BY 1)"""

  private val dbscanFinalSelectSql =
    """SELECT pts.vec_id, CAST(n_nb AS BIGINT) AS n_nb,
              CASE WHEN k.vec_id IS NOT NULL THEN 'core'
                   WHEN b.vec_id IS NOT NULL THEN 'border'
                   ELSE 'noise' END AS role,
              CAST(coalesce(k.cluster, b.cluster, -1) AS BIGINT) AS cluster
       FROM pts LEFT JOIN core_cl k ON k.vec_id = pts.vec_id
                LEFT JOIN bord b ON b.vec_id = pts.vec_id
       ORDER BY pts.vec_id"""

  private val q415Sql =
    s"""WITH RECURSIVE
       p AS MATERIALIZED (
         SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                CAST(embedding[2] AS DOUBLE) AS y
         FROM embeddings),
       ${dbscanChainSql(0.02, 4)}
       $dbscanFinalSelectSql"""

  // --------------------------------------------------------------- q416
  /** ROUGE-2 clipped recall (Lin 2004) — the contamination metric the
    * distinct-gram audits (q75/q411) cannot express: clipping credits
    * each candidate bigram at most min(count_cand, count_ref) times, so
    * a document that repeats one benchmark bigram 50× scores the same
    * as one containing it once, while q411's distinct-hit fraction
    * cannot tell "quotes the whole item" from "shares its stock
    * phrases at high multiplicity". Per (benchmark item, corpus doc):
    * recall = Σ_g min(c_cand(g), c_ref(g)) / |ref bigrams| (multiset).
    * Benchmark items are the q411 doc_id % 97 == 0 convention. 100 TB
    * shape: the bigram-count relation is built once (one hash-agg on
    * (doc, gram)); the benchmark side of it is KBs and BROADCASTS into
    * the candidate join, so the corpus side streams map-side and only
    * (bench, doc) hit groups shuffle; integers until the final ratio;
    * top-100 is a TakeOrdered under a total order. */
  private def q416(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = d.select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    // materialized once: the bigram-count relation feeds the benchmark
    // side, the per-item totals, and the corpus candidate side
    val bg = toks.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => concat(element_at(col("t"), i), lit(" "),
            element_at(col("t"), i + 1)))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val ref = bg.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("doc_id").as("bench_id"), col("g"), col("c").as("cr"))
    val refTot = ref.groupBy("bench_id").agg(sum("cr").as("ref_total"))
    val clipped = bg.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .join(broadcast(ref), Seq("g"))
      .groupBy("bench_id", "doc_id")
      .agg(sum(least(col("c"), col("cr"))).as("clipped"))
    clipped.join(broadcast(refTot), Seq("bench_id"))
      .select(col("bench_id").cast("long").as("bench_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("clipped").cast("long").as("clipped"),
        col("ref_total").cast("long").as("ref_total"),
        round(col("clipped").cast("double") / col("ref_total"), 6).as("rouge2"))
      .orderBy(col("rouge2").desc, col("bench_id"), col("doc_id"))
      .limit(100)
  }

  private val q416Sql = {
    val toksSql = "regexp_split_to_array(trim(text), '\\s+')"
    s"""WITH toks AS (
         SELECT doc_id, $toksSql AS t FROM documents
         WHERE len($toksSql) >= 2),
       bg AS MATERIALIZED (
         SELECT doc_id, u.g, count(*) AS c
         FROM (SELECT doc_id,
                 list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1]) AS gs
               FROM toks),
              unnest(gs) AS u(g)
         GROUP BY 1, 2),
       ref AS MATERIALIZED (
         SELECT doc_id AS bench_id, g, c AS cr FROM bg WHERE doc_id % 97 = 0),
       rt AS (SELECT bench_id, sum(cr) AS ref_total FROM ref GROUP BY 1),
       cl AS (
         SELECT r.bench_id, c.doc_id, sum(least(c.c, r.cr)) AS clipped
         FROM bg c JOIN ref r ON r.g = c.g
         WHERE c.doc_id % 97 <> 0
         GROUP BY 1, 2)
       SELECT cl.bench_id, cl.doc_id,
              CAST(clipped AS BIGINT) AS clipped,
              CAST(ref_total AS BIGINT) AS ref_total,
              round(clipped * 1.0 / ref_total, 6) AS rouge2
       FROM cl JOIN rt USING (bench_id)
       ORDER BY rouge2 DESC, cl.bench_id, cl.doc_id LIMIT 100"""
  }

  // --------------------------------------------------------------- q417
  /** Cluster-aware split leakage audit — q378's temporal-leakage
    * companion for NEAR-DUP leakage: hashing doc ids into train/eval
    * strands near-duplicate pairs on opposite sides (the eval set then
    * "contains" lightly-edited training docs), while hashing the
    * CLUSTER representative (the q65 component label, singletons =
    * themselves) sends every near-dup family to one side by
    * construction. One row per scheme: split sizes, total near-dup
    * pairs, and how many straddle the split — doc_hash shows the
    * leak, cluster_hash must show 0. Determinism: the 80/20 split is
    * md5(id) % 10 < 8 (the stratified-sampling convention, q76), and
    * every count is an integer. 100 TB shape: pairs and components
    * are the q65 blocked near-dup path; the audit itself is two
    * integer aggregates over one (pair ⋈ assignment) join keyed on
    * ids — no new quadratics, and the 1-row aggregates cross-join
    * into the 2-row report. */
  private def q417(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir)("embeddings")
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        blockCol = "label", threshold = 0.3)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint() // feeds components AND the straddle join
    val comp = ConnectedComponents.components(pairs, "id_a", "id_b")
    val rep = emb.select(col("vec_id"))
      .join(comp, col("vec_id") === col("id"), "left")
      .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("rep"))
    def train(c: Column): Column =
      (conv(substring(md5(encode(c.cast("string"), "UTF-8")), 1, 8), 16, 10)
        .cast("long") % 10) < 8
    val asg = rep.select(col("vec_id"),
        train(col("vec_id")).as("td"), train(col("rep")).as("tc"))
      .localCheckpoint() // feeds the size agg and both join sides
    val sizes = asg.agg(
      sum(when(col("td"), 1L).otherwise(0L)).as("tr_d"),
      sum(when(!col("td"), 1L).otherwise(0L)).as("ev_d"),
      sum(when(col("tc"), 1L).otherwise(0L)).as("tr_c"),
      sum(when(!col("tc"), 1L).otherwise(0L)).as("ev_c"))
    val straddle = pairs
      .join(asg.select(col("vec_id").as("id_a"), col("td").as("ta_d"),
        col("tc").as("ta_c")), Seq("id_a"))
      .join(asg.select(col("vec_id").as("id_b"), col("td").as("tb_d"),
        col("tc").as("tb_c")), Seq("id_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("ta_d") =!= col("tb_d"), 1L).otherwise(0L)).as("lk_d"),
        sum(when(col("ta_c") =!= col("tb_c"), 1L).otherwise(0L)).as("lk_c"))
    val joined = sizes.crossJoin(straddle)
    joined.select(lit("cluster_hash").as("scheme"),
        col("tr_c").cast("long").as("n_train"),
        col("ev_c").cast("long").as("n_eval"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("lk_c").cast("long").as("n_leaked"))
      .union(joined.select(lit("doc_hash"),
        col("tr_d").cast("long"), col("ev_d").cast("long"),
        col("n_pairs").cast("long"), col("lk_d").cast("long")))
      .orderBy("scheme")
  }

  private val q417Sql = {
    // cosSql carries the zero-norm guard matching Similarity.nearDupPairs
    s"""WITH RECURSIVE
       p AS MATERIALIZED (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE ${OracleVec.cosSql("a.embedding", "b.embedding")} >= 0.3),
       und AS MATERIALIZED (
         SELECT id_a AS a, id_b AS b FROM p
         UNION SELECT id_b, id_a FROM p),
       cc AS (SELECT a, b FROM und
              UNION SELECT cc.a, u.b FROM cc JOIN und u ON cc.b = u.a),
       comp AS (SELECT a AS vec_id, least(a, min(b)) AS component
                FROM cc GROUP BY a),
       rep AS (
         SELECT e.vec_id, coalesce(component, e.vec_id) AS rep
         FROM embeddings e LEFT JOIN comp USING (vec_id)),
       asg AS MATERIALIZED (
         SELECT vec_id,
           (('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
             % 10) < 8 AS td,
           (('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 8))::BIGINT
             % 10) < 8 AS tc
         FROM rep),
       sizes AS (
         SELECT sum(CASE WHEN td THEN 1 ELSE 0 END) AS tr_d,
                sum(CASE WHEN td THEN 0 ELSE 1 END) AS ev_d,
                sum(CASE WHEN tc THEN 1 ELSE 0 END) AS tr_c,
                sum(CASE WHEN tc THEN 0 ELSE 1 END) AS ev_c
         FROM asg),
       strad AS (
         SELECT count(*) AS n_pairs,
                sum(CASE WHEN a.td <> b.td THEN 1 ELSE 0 END) AS lk_d,
                sum(CASE WHEN a.tc <> b.tc THEN 1 ELSE 0 END) AS lk_c
         FROM p JOIN asg a ON a.vec_id = p.id_a
                JOIN asg b ON b.vec_id = p.id_b),
       j AS (SELECT * FROM sizes CROSS JOIN strad)
       SELECT 'cluster_hash' AS scheme, CAST(tr_c AS BIGINT) AS n_train,
              CAST(ev_c AS BIGINT) AS n_eval,
              CAST(n_pairs AS BIGINT) AS n_pairs,
              CAST(lk_c AS BIGINT) AS n_leaked
       FROM j
       UNION ALL
       SELECT 'doc_hash', CAST(tr_d AS BIGINT), CAST(ev_d AS BIGINT),
              CAST(n_pairs AS BIGINT), CAST(lk_d AS BIGINT)
       FROM j
       ORDER BY scheme"""
  }

  // --------------------------------------------------------------- q418
  /** Distributed PCA: exact covariance pass + fixed 8-step power
    * iteration — the embedding-space spectrum probe (all reasoning on
    * [[graft.operators.Pca]]). The oracle unrolls the same 8 matvec /
    * normalize steps as CTE stages over the round(6)'d covariance, so
    * the eigenvector comparison is bit-exact, not float-close: the
    * rounding boundary is the covariance entries (corpus float sums
    * differ at ~1e-14 across engines, absorbed at 6 decimals — the
    * q376 precedent), and everything downstream folds in sorted
    * order on identical doubles. */
  private def q418(s: SparkSession, dir: String): DataFrame = {
    val cov = Pca.covariance(Tables(s, dir)("embeddings"),
      "vec_id", "embedding", dim = 64)
    Pca.powerIteration(cov, dim = 64, iters = 8).orderBy("i")
  }

  /** 8 unrolled power-iteration CTE stages over matrix CTE `mat`
    * (columns i, j, c), vector CTEs named `${p}0`..`${p}8` — the SQL
    * twin of Pca.iterate's ascending-index folds. */
  private def powerStepsSql(mat: String, p: String): String = {
    val seed = s"""${p}0 AS (SELECT t.i - 1 AS i, 0.125 AS v
              FROM unnest(generate_series(1, 64)) AS t(i))"""
    val steps = (1 to 8).map { k =>
      s"""${p}w$k AS (
           SELECT $mat.i,
             list_sum(list_transform(
               list({'k': $mat.j, 't': $mat.c * v.v} ORDER BY $mat.j),
               e -> e.t)) AS w
           FROM $mat JOIN ${p}${k - 1} v ON v.i = $mat.j GROUP BY $mat.i),
         ${p}n$k AS (
           SELECT sqrt(list_sum(list_transform(
             list({'k': i, 't': w * w} ORDER BY i), e -> e.t))) AS nm
           FROM ${p}w$k),
         ${p}$k AS MATERIALIZED (
           SELECT i, w / nm AS v FROM ${p}w$k CROSS JOIN ${p}n$k)"""
    }.mkString(",\n       ")
    s"$seed,\n       $steps"
  }

  /** Shared q418-q420 oracle prefix: covariance fit + 8 unrolled power
    * steps, ending at the (unsigned) eigenvector CTE `v8`. */
  private val pcaFitChainSql =
    s"""WITH x AS MATERIALIZED (
         SELECT vec_id AS rid, t.i - 1 AS i,
                CAST(embedding[t.i] AS DOUBLE) AS xi
         FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
       means AS MATERIALIZED (
         SELECT i, sum(xi) / count(*) AS m FROM x GROUP BY 1),
       prod AS (
         SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS sp, count(*) AS n
         FROM x a JOIN x b ON a.rid = b.rid GROUP BY 1, 2),
       cov AS MATERIALIZED (
         SELECT p.i, p.j, round(sp / n - ma.m * mb.m, 6) AS c
         FROM prod p JOIN means ma ON ma.i = p.i
                     JOIN means mb ON mb.i = p.j),
       ${powerStepsSql("cov", "v")}"""

  private val q418Sql =
    s"""$pcaFitChainSql,
       wf AS (
         SELECT cov.i,
           list_sum(list_transform(
             list({'k': cov.j, 't': cov.c * v.v} ORDER BY cov.j),
             e -> e.t)) AS w
         FROM cov JOIN v8 v ON v.i = cov.j GROUP BY cov.i),
       ray AS (
         SELECT list_sum(list_transform(
           list({'k': v.i, 't': v.v * wf.w} ORDER BY v.i), e -> e.t)) AS lam
         FROM v8 v JOIN wf ON wf.i = v.i),
       tr AS (
         SELECT list_sum(list_transform(
           list({'k': i, 't': c} ORDER BY i), e -> e.t)) AS tr
         FROM cov WHERE i = j),
       sg AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
              FROM v8 WHERE i = 0)
       SELECT CAST(v.i AS BIGINT) AS i,
              round(v.v * sg.sg, 6) AS loading,
              round(ray.lam, 6) AS eigenvalue,
              round(ray.lam / tr.tr, 6) AS var_explained
       FROM v8 v CROSS JOIN ray CROSS JOIN tr CROSS JOIN sg
       ORDER BY i"""

  // --------------------------------------------------------------- q419
  /** PCA reconstruction-error outliers — the spectral outlier score
    * q418's model enables: residual = ‖x−μ‖² − ((x−μ)·v)², the
    * centered variance the top principal axis CANNOT explain. A
    * document whose embedding is far from the corpus's dominant
    * direction is the curation-review candidate that per-dimension
    * z-scores miss (it can be in-range on every axis yet off-manifold
    * jointly). Determinism: centering uses the round(6)'d means and
    * the bit-exact eigenvector (see [[graft.operators.Pca]]), so every
    * score is IEEE-identical across engines (proj enters squared, so
    * the sign convention cancels); 100 TB shape: the fit is the one
    * d²-keyed covariance pass, then scoring is a single narrow
    * map over the corpus with the d+d doubles inlined as literals
    * (zero-shuffle, the literal-centroid argmax precedent), and the
    * top-20 is a TakeOrdered. */
  private def q419(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val e = Tables(s, dir)("embeddings")
    val model = Pca.fit(e, "vec_id", "embedding", dim, iters = 8)
    val mL = typedLit(model.means)
    val vL = typedLit(model.loadings)
    def centered(i: Column): Column =
      element_at(col("embedding"), i).cast("double") - element_at(mL, i)
    def fold(term: Column => Column): Column =
      aggregate(transform(sequence(lit(1), lit(dim)), i => term(i)),
        lit(0.0), (a, x) => a + x)
    e.select(col("vec_id"), col("label"),
        fold(i => centered(i) * centered(i)).as("ss"),
        fold(i => element_at(vL, i) * centered(i)).as("proj"))
      .select(col("vec_id").cast("long").as("vec_id"), col("label"),
        round(col("ss"), 6).as("centered_ss"),
        round(col("ss") - col("proj") * col("proj"), 6).as("residual"),
        round(when(col("ss") === 0, 0.0)
          .otherwise((col("ss") - col("proj") * col("proj")) / col("ss")), 6)
          .as("resid_frac"))
      .orderBy(col("residual").desc, col("vec_id"))
      .limit(20)
  }

  private val q419Sql = {
    // same fit chain as q418 (x/means/prod/cov/v0..v8), then per-row
    // scoring against the rounded means + final eigenvector as lists
    s"""$pcaFitChainSql,
       mr AS (SELECT list(round(m, 6) ORDER BY i) AS ml FROM means),
       vl AS (SELECT list(v ORDER BY i) AS vl FROM v8),
       scored AS (
         SELECT e.vec_id, e.label,
           list_sum(list_transform(generate_series(1, 64),
             i -> (CAST(e.embedding[i] AS DOUBLE) - ml[i]) *
                  (CAST(e.embedding[i] AS DOUBLE) - ml[i]))) AS ss,
           list_sum(list_transform(generate_series(1, 64),
             i -> vl[i] * (CAST(e.embedding[i] AS DOUBLE) - ml[i]))) AS proj
         FROM embeddings e CROSS JOIN mr CROSS JOIN vl)
       SELECT vec_id, label, round(ss, 6) AS centered_ss,
              round(ss - proj * proj, 6) AS residual,
              round(CASE WHEN ss = 0 THEN 0.0
                    ELSE (ss - proj * proj) / ss END, 6) AS resid_frac
       FROM scored ORDER BY residual DESC, vec_id LIMIT 20"""
  }

  // --------------------------------------------------------------- q420
  /** Top-2 principal axes by Hotelling deflation — the principled
    * basis for the 2-D corpus map q415 clusters (project onto pc1/pc2
    * instead of raw coordinates) and the spectral-decay readout
    * (λ2/λ1 near 1 means no dominant axis; cum_var2 near 1 means the
    * space is effectively 2-D and high-dim ANN budgets are wasted).
    * Deflation C−λ·v·vᵀ uses the UNSIGNED eigenvector (vᵢ·vⱼ is
    * sign-invariant), so both engines deflate the bit-identical
    * matrix; the second chain is the same 8 unrolled steps from the
    * uniform seed. One corpus pass total ([[graft.operators.Pca]]). */
  private def q420(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val model = Pca.fitTopK(Tables(s, dir)("embeddings"),
      "vec_id", "embedding", dim = 64, k = 2, iters = 8)
    val Seq((v1, lam1), (v2, lam2)) = model.components.toSeq
    val trace = model.trace
    (0 until 64).map(i => (i.toLong, v1(i), v2(i))).toDF("i", "p1", "p2")
      .select(col("i"),
        round(col("p1"), 6).as("pc1"),
        round(col("p2"), 6).as("pc2"),
        round(lit(lam1), 6).as("lam1"),
        round(lit(lam2), 6).as("lam2"),
        round(lit(lam2) / lam1, 6).as("decay"),
        round((lit(lam1) + lam2) / trace, 6).as("cum_var2"))
      .orderBy("i")
  }

  private val q420Sql =
    s"""$pcaFitChainSql,
       wf AS (
         SELECT cov.i,
           list_sum(list_transform(
             list({'k': cov.j, 't': cov.c * v.v} ORDER BY cov.j),
             e -> e.t)) AS w
         FROM cov JOIN v8 v ON v.i = cov.j GROUP BY cov.i),
       ray AS (
         SELECT list_sum(list_transform(
           list({'k': v.i, 't': v.v * wf.w} ORDER BY v.i), e -> e.t)) AS lam
         FROM v8 v JOIN wf ON wf.i = v.i),
       cov2 AS MATERIALIZED (
         SELECT c.i, c.j, c.c - ray.lam * va.v * vb.v AS c
         FROM cov c JOIN v8 va ON va.i = c.i
                    JOIN v8 vb ON vb.i = c.j
                    CROSS JOIN ray),
       ${powerStepsSql("cov2", "u")},
       wf2 AS (
         SELECT cov2.i,
           list_sum(list_transform(
             list({'k': cov2.j, 't': cov2.c * v.v} ORDER BY cov2.j),
             e -> e.t)) AS w
         FROM cov2 JOIN u8 v ON v.i = cov2.j GROUP BY cov2.i),
       ray2 AS (
         SELECT list_sum(list_transform(
           list({'k': v.i, 't': v.v * wf2.w} ORDER BY v.i), e -> e.t)) AS lam
         FROM u8 v JOIN wf2 ON wf2.i = v.i),
       tr AS (
         SELECT list_sum(list_transform(
           list({'k': i, 't': c} ORDER BY i), e -> e.t)) AS tr
         FROM cov WHERE i = j),
       sg1 AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
               FROM v8 WHERE i = 0),
       sg2 AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
               FROM u8 WHERE i = 0)
       SELECT CAST(a.i AS BIGINT) AS i,
              round(a.v * sg1.sg, 6) AS pc1,
              round(b.v * sg2.sg, 6) AS pc2,
              round(ray.lam, 6) AS lam1,
              round(ray2.lam, 6) AS lam2,
              round(ray2.lam / ray.lam, 6) AS decay,
              round((ray.lam + ray2.lam) / tr.tr, 6) AS cum_var2
       FROM v8 a JOIN u8 b ON b.i = a.i
       CROSS JOIN ray CROSS JOIN ray2 CROSS JOIN tr
       CROSS JOIN sg1 CROSS JOIN sg2
       ORDER BY i"""

  // --------------------------------------------------------------- q421
  /** The CORPUS MAP, end to end: PCA top-2 projection (q420's basis)
    * composed with grid-blocked DBSCAN (q415's operator) — density
    * modes and named outliers in the plane that actually maximizes
    * spread, instead of q415's raw-coordinate stand-in. Projection is
    * one zero-shuffle map (rounded means + bit-exact signed loadings
    * as literals, the q419 discipline), so coordinates are
    * IEEE-identical across engines and the whole DBSCAN chain —
    * replayed quadratically by the oracle with the recursive-CTE
    * closure — agrees bit-for-bit. eps=0.025/minPts=4 give 252 cores
    * of 500 at sf0.01. */
  private def q421(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val e = Tables(s, dir)("embeddings")
    val model = Pca.fitTopK(e, "vec_id", "embedding", dim, k = 2, iters = 8)
    val mL = typedLit(model.means)
    def centered(i: Column): Column =
      element_at(col("embedding"), i).cast("double") - element_at(mL, i)
    def proj(v: Array[Double]): Column = {
      val vL = typedLit(v)
      aggregate(transform(sequence(lit(1), lit(dim)),
        i => element_at(vL, i) * centered(i)), lit(0.0), (a, x) => a + x)
    }
    val p = e.select(col("vec_id"),
      proj(model.components(0)._1).as("x"),
      proj(model.components(1)._1).as("y"))
    Dbscan.cluster(p, "vec_id", "x", "y", eps = 0.025, minPts = 4)
      .orderBy("vec_id")
  }

  private val q421Sql =
    s"""${pcaFitChainSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
       wf AS (
         SELECT cov.i,
           list_sum(list_transform(
             list({'k': cov.j, 't': cov.c * v.v} ORDER BY cov.j),
             e -> e.t)) AS w
         FROM cov JOIN v8 v ON v.i = cov.j GROUP BY cov.i),
       ray AS (
         SELECT list_sum(list_transform(
           list({'k': v.i, 't': v.v * wf.w} ORDER BY v.i), e -> e.t)) AS lam
         FROM v8 v JOIN wf ON wf.i = v.i),
       cov2 AS MATERIALIZED (
         SELECT c.i, c.j, c.c - ray.lam * va.v * vb.v AS c
         FROM cov c JOIN v8 va ON va.i = c.i
                    JOIN v8 vb ON vb.i = c.j
                    CROSS JOIN ray),
       ${powerStepsSql("cov2", "u")},
       sg1 AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
               FROM v8 WHERE i = 0),
       sg2 AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
               FROM u8 WHERE i = 0),
       mr AS (SELECT list(round(m, 6) ORDER BY i) AS ml FROM means),
       vl1 AS (SELECT list(v * sg ORDER BY i) AS vl
               FROM v8 CROSS JOIN sg1),
       vl2 AS (SELECT list(v * sg ORDER BY i) AS vl
               FROM u8 CROSS JOIN sg2),
       p AS MATERIALIZED (
         SELECT e.vec_id,
           list_sum(list_transform(generate_series(1, 64),
             i -> vl1.vl[i] * (CAST(e.embedding[i] AS DOUBLE) - ml[i])))
             AS x,
           list_sum(list_transform(generate_series(1, 64),
             i -> vl2.vl[i] * (CAST(e.embedding[i] AS DOUBLE) - ml[i])))
             AS y
         FROM embeddings e CROSS JOIN mr CROSS JOIN vl1 CROSS JOIN vl2),
       ${dbscanChainSql(0.025, 4)}
       $dbscanFinalSelectSql"""

  // --------------------------------------------------------------- q427
  /** Adjusted Rand Index (Hubert & Arabie 1985) between the DBSCAN
    * corpus-map clusters and the embedding labels — EXTERNAL cluster
    * validation: purity (q295) rewards shattering into tiny clusters,
    * ARI's chance correction does not. Noise points become singleton
    * clusters (-(id+1)), the full-partition convention. Everything is
    * pair-counting combinatorics on INTEGER contingency counts — three
    * hash-aggs on (cluster, label) and its margins, with the chance
    * expectation's single double-division sequence written identically
    * on both engines. (Integer nC2 overflows past ~3e9 rows; at that
    * scale the sums switch to DOUBLE — noted, not needed here.) */
  private def q427(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    val p = e.select(col("vec_id"),
      element_at(col("embedding"), 1).as("x"),
      element_at(col("embedding"), 2).as("y"))
    val asg = Dbscan.cluster(p, "vec_id", "x", "y", eps = 0.02, minPts = 4)
      .select(col("vec_id"),
        when(col("cluster") >= 0, col("cluster"))
          .otherwise(-(col("vec_id") + 1)).as("cl"))
    val cont = asg.join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy("cl", "label").agg(count(lit(1)).as("nij"))
      .localCheckpoint() // feeds the pair sum and both margins
    val sij = cont.agg(sum(expr("(nij * (nij - 1)) div 2")).as("sij"),
      sum("nij").as("n"))
    val sa = cont.groupBy("cl").agg(sum("nij").as("a"))
      .agg(sum(expr("(a * (a - 1)) div 2")).as("sa"),
        count(lit(1)).as("n_clusters"))
    val sb = cont.groupBy("label").agg(sum("nij").as("b"))
      .agg(sum(expr("(b * (b - 1)) div 2")).as("sb"),
        count(lit(1)).as("n_labels"))
    val j = sij.crossJoin(sa).crossJoin(sb)
      .withColumn("cn2", expr("(n * (n - 1)) div 2"))
      .withColumn("exp", col("sa").cast("double") * col("sb") / col("cn2"))
      .withColumn("den", (col("sa") + col("sb")) / lit(2.0) - col("exp"))
    j.select(col("n").cast("long").as("n"),
        col("n_clusters").cast("long").as("n_clusters"),
        col("n_labels").cast("long").as("n_labels"),
        col("sij").cast("long").as("pairs_both"),
        col("sa").cast("long").as("pairs_cluster"),
        col("sb").cast("long").as("pairs_label"),
        round(when(col("den") === 0, 1.0)
          .otherwise((col("sij") - col("exp")) / col("den")), 6).as("ari"))
  }

  private val q427Sql =
    s"""WITH RECURSIVE
       p AS MATERIALIZED (
         SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                CAST(embedding[2] AS DOUBLE) AS y
         FROM embeddings),
       ${dbscanChainSql(0.02, 4)},
       asg AS (
         SELECT pts.vec_id,
                coalesce(k.cluster, b.cluster, -(pts.vec_id + 1)) AS cl
         FROM pts LEFT JOIN core_cl k ON k.vec_id = pts.vec_id
                  LEFT JOIN bord b ON b.vec_id = pts.vec_id),
       cont AS MATERIALIZED (
         SELECT cl, e.label, count(*) AS nij
         FROM asg JOIN embeddings e USING (vec_id)
         GROUP BY 1, 2),
       sij AS (SELECT sum((nij * (nij - 1)) // 2) AS sij, sum(nij) AS n
               FROM cont),
       sa AS (SELECT sum((a * (a - 1)) // 2) AS sa,
                     count(*) AS n_clusters
              FROM (SELECT cl, sum(nij) AS a FROM cont GROUP BY 1)),
       sb AS (SELECT sum((b * (b - 1)) // 2) AS sb,
                     count(*) AS n_labels
              FROM (SELECT label, sum(nij) AS b FROM cont GROUP BY 1)),
       j AS (
         SELECT *, (n * (n - 1)) // 2 AS cn2,
                CAST(sa AS DOUBLE) * sb / ((n * (n - 1)) // 2) AS expd
         FROM sij CROSS JOIN sa CROSS JOIN sb)
       SELECT CAST(n AS BIGINT) AS n,
              CAST(n_clusters AS BIGINT) AS n_clusters,
              CAST(n_labels AS BIGINT) AS n_labels,
              CAST(sij AS BIGINT) AS pairs_both,
              CAST(sa AS BIGINT) AS pairs_cluster,
              CAST(sb AS BIGINT) AS pairs_label,
              round(CASE WHEN (sa + sb) / 2.0 - expd = 0 THEN 1.0
                    ELSE (sij - expd) / ((sa + sb) / 2.0 - expd) END, 6)
                AS ari
       FROM j"""

  override def queries: Map[String, QueryFn] = Map(
    "q427_dbscan_ari" -> q427 _,
    "q415_dbscan" -> q415 _,
    "q416_rouge2_clip" -> q416 _,
    "q417_split_leakage" -> q417 _,
    "q418_pca_power" -> q418 _,
    "q419_pca_outliers" -> q419 _,
    "q420_pca_top2" -> q420 _,
    "q421_corpus_map" -> q421 _)

  override def oracles: Map[String, String] = Map(
    "q427_dbscan_ari" -> q427Sql,
    "q415_dbscan" -> q415Sql,
    "q416_rouge2_clip" -> q416Sql,
    "q417_split_leakage" -> q417Sql,
    "q418_pca_power" -> q418Sql,
    "q419_pca_outliers" -> q419Sql,
    "q420_pca_top2" -> q420Sql,
    "q421_corpus_map" -> q421Sql)
}
