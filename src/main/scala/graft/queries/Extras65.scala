package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SubstringDedup

/** Round-8 pack, part 8: importance-weighted data selection (q406),
  * containment-vs-resemblance dedup (q409/q410), contamination and
  * syndication audits (q411/q412), and the Zipf rank-frequency fit
  * (q414).
  */
object Extras65 extends QueryPack {

  // --------------------------------------------------------------- q406
  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the log-likelihood ratio of a TARGET-domain hashed
    * unigram model (source `src0`, the q366 hashing trick: 64 md5
    * buckets) against the whole-corpus model, Laplace(+1) smoothed —
    * logw = Σ_b n_db · (ln p_t(b) − ln p_c(b)) — and keep the top-20
    * most target-like documents. Determinism discipline: bucket
    * counts and totals are exact integers; each ln term is one
    * ln of an integer-derived ratio; and the per-doc sum folds the
    * (bucket, term) list in SORTED bucket order on both engines, so
    * no float-summation order diverges. 100 TB shape: the two
    * 64-row bucket models broadcast, totals are the precedented 1-row
    * scalar cross join, the corpus shuffles once on (doc, bucket),
    * and the top-20 is a TakeOrdered — no global sort. */
  private def q406(s: SparkSession, dir: String): DataFrame = {
    val B = 64
    val d = Tables(s, dir)("documents")
    val tk = d.select(col("doc_id"), col("source"),
        explode(SubstringDedup.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(encode(col("tok"), "UTF-8")), 1, 8), 16, 10)
          .cast("long") % B).as("bucket"))
    val db = tk.groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
    val t = tk.filter(col("source") === "src0")
      .groupBy("bucket").agg(count(lit(1)).as("tb"))
    val c = tk.groupBy("bucket").agg(count(lit(1)).as("cb"))
    val tot = t.agg(sum("tb").as("tt"))
      .crossJoin(c.agg(sum("cb").as("ct")))
    val terms = db
      .join(broadcast(t), Seq("bucket"), "left")
      .join(broadcast(c), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("bucket"), col("n"),
        (col("n") * (log((coalesce(col("tb"), lit(0L)) + 1).cast("double") /
            (col("tt") + B)) -
          log((col("cb") + 1).cast("double") / (col("ct") + B))))
          .as("term"))
    val perDoc = terms
      .groupBy("doc_id")
      .agg(sum("n").cast("long").as("n_toks"),
        aggregate(
          transform(sort_array(collect_list(struct(col("bucket"), col("term")))),
            e => e.getField("term")),
          lit(0.0), (acc, x) => acc + x).as("lw"))
      .withColumn("logw", round(col("lw"), 6))
    perDoc
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_toks"), col("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(20)
  }

  private val q406Sql = {
    val B = 64
    s"""WITH toks AS (
         SELECT doc_id, source,
                list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '') AS t
         FROM documents),
       tk AS MATERIALIZED (
         SELECT doc_id, source,
                ('0x' || substr(md5(u.tok), 1, 8))::BIGINT % $B AS bucket
         FROM toks, unnest(t) AS u(tok)),
       db AS (SELECT doc_id, bucket, count(*) AS n
              FROM tk GROUP BY 1, 2),
       tm AS MATERIALIZED (
         SELECT bucket, count(*) AS tb FROM tk
         WHERE source = 'src0' GROUP BY 1),
       cm AS MATERIALIZED (
         SELECT bucket, count(*) AS cb FROM tk GROUP BY 1),
       tot AS (SELECT (SELECT sum(tb) FROM tm) AS tt,
                      (SELECT sum(cb) FROM cm) AS ct),
       terms AS (
         SELECT db.doc_id, db.bucket, db.n,
                db.n * (ln((coalesce(tm.tb, 0) + 1) /
                           CAST(tot.tt + $B AS DOUBLE)) -
                        ln((cm.cb + 1) /
                           CAST(tot.ct + $B AS DOUBLE))) AS term
         FROM db LEFT JOIN tm ON tm.bucket = db.bucket
                 JOIN cm ON cm.bucket = db.bucket
                 CROSS JOIN tot),
       per_doc AS (
         SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_toks,
                round(list_sum(list_transform(
                  list({'b': bucket, 'v': term} ORDER BY bucket),
                  e -> e.v)), 6) AS logw
         FROM terms GROUP BY doc_id)
       SELECT p.doc_id, d.source, p.n_toks, p.logw
       FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
       ORDER BY p.logw DESC, p.doc_id LIMIT 20"""
  }

  // --------------------------------------------------------------- q409
  /** CONTAINMENT-vs-resemblance dedup (Broder 1997's distinction,
    * applied): resemblance (Jaccard) misses near-SUBSET pairs — a
    * quote fully contained in a longer document scores low Jaccard but
    * containment |A∩B|/min(|A|,|B|) near 1. Candidates come from the
    * capped md5 LSH pipeline with NO est-Jaccard floor (the floor is
    * exactly what would drop subset pairs); each candidate is then
    * scored EXACTLY on the raw 5-char shingle relation — pair →
    * shingles-of-a → equi-join shingles-of-b on (doc, shingle), never
    * arrays on a shuffle — and flagged near_subset when containment
    * >= 0.8 while Jaccard < 0.5. Top-100 under a total order.
    *
    * Honest recall note: banding on SYMMETRIC minhash collides with
    * probability j^bands, so extreme subset pairs (tiny B inside huge
    * A, Jaccard near |B|/|A|) rarely surface here — that structural
    * gap is Broder's argument for a containment-oriented sketch. The
    * production remedy is ASYMMETRIC banding (band only the smaller
    * side's minima, probe the larger side's full shingle stream —
    * exactly the [[graft.operators.Dedup.minhashGate]] new-vs-index
    * shape with the small doc as the "new" side); this table audits
    * what the symmetric candidate set does contain. */
  private def q409(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import graft.operators.{Dedup, Spread}
    val d = Tables(s, dir)("documents")
    // ONE shingling pass (Spread-guarded): the per-doc shingle arrays
    // feed BOTH the md5 signature leg and the exact gram relation —
    // previously each leg re-shingled the corpus from the raw text
    val withSh = Spread.byKey(d, col("doc_id"))
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        TextFunctions.charShingles(col("text"), 5).as("__sh"))
      .localCheckpoint()
    // materialized once: the whole LSH candidate pipeline feeds both
    // the intersection join and the scored left-join spine
    val sigs = Dedup.minhashSignaturesComposed(withSh, "doc_id", "__sh",
        16, Dedup.mdBaseHash)
      .localCheckpoint()
    val cand = Dedup.minhashCandidates(sigs, "doc_id", k = 16, bands = 4,
        threshold = 0.0, hashBandKeys = false, maxBucket = 10)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    // materialized once: the exploded shingle relation feeds both
    // intersection sides AND the per-doc counts (the SetSimilarityJoin
    // input-caching discipline — without this the tokenize+explode
    // subtree runs three times)
    val g = withSh
      .select(col("doc_id"), explode(col("__sh")).as("g"))
      .localCheckpoint()
    val cnt = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(g.select(col("doc_id").as("id_a"), col("g")), Seq("id_a"))
      .join(g.select(col("doc_id").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ix"))
    val scored = cand.join(inter, Seq("id_a", "id_b"), "left")
      .withColumn("ix", coalesce(col("ix"), lit(0L)))
      .join(cnt.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(cnt.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jac", col("ix").cast("double") /
        (col("na") + col("nb") - col("ix")))
      .withColumn("cont", col("ix").cast("double") / least(col("na"), col("nb")))
    scored.select(col("id_a"), col("id_b"),
        col("ix").cast("long").as("shared"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        round(col("jac"), 6).as("jaccard"),
        round(col("cont"), 6).as("containment"),
        when(col("cont") >= 0.8 && col("jac") < 0.5, 1L).otherwise(0L)
          .as("near_subset"))
      .orderBy(col("containment").desc, col("id_a"), col("id_b"))
      .limit(100)
  }

  private val q409Sql = {
    val P = graft.functions.expressions.MinHashSignature.P
    val sigList = (0 until 16)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val bandKey = (1 to 4)
      .map(j => s"sig[4 * t.b + $j]::VARCHAR")
      .mkString(" || ',' || ")
    s"""WITH sh AS MATERIALIZED (
         SELECT doc_id,
           list_distinct(list_transform(generate_series(1, length(text) - 4),
             i -> substring(text, i, 5))) AS shs
         FROM documents WHERE length(text) >= 5),
       d AS (
         SELECT doc_id,
           list_transform(shs,
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P) AS hx
         FROM sh),
       sigs AS (SELECT doc_id, $sigList AS sig FROM d),
       bands AS MATERIALIZED (
         SELECT doc_id, t.b AS band_idx, $bandKey AS band_key
         FROM sigs, unnest(generate_series(0, 3)) AS t(b)),
       hot AS (
         SELECT band_idx, band_key FROM bands
         GROUP BY band_idx, band_key HAVING count(*) > 10),
       cold AS (
         SELECT bands.* FROM bands
         WHERE NOT EXISTS (
           SELECT 1 FROM hot
           WHERE hot.band_idx = bands.band_idx
             AND hot.band_key = bands.band_key)),
       cand AS MATERIALIZED (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM cold a JOIN cold b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
       g AS MATERIALIZED (
         SELECT doc_id, u.g FROM sh, unnest(shs) AS u(g)),
       cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
       ix AS (
         SELECT c.id_a, c.id_b, count(*) AS ix
         FROM cand c JOIN g a ON a.doc_id = c.id_a
                     JOIN g b ON b.doc_id = c.id_b AND b.g = a.g
         GROUP BY 1, 2),
       scored AS (
         SELECT c.id_a, c.id_b, coalesce(ix.ix, 0) AS ix, ca.n AS na, cb.n AS nb
         FROM cand c LEFT JOIN ix ON ix.id_a = c.id_a AND ix.id_b = c.id_b
                     JOIN cnt ca ON ca.doc_id = c.id_a
                     JOIN cnt cb ON cb.doc_id = c.id_b)
       SELECT id_a, id_b, CAST(ix AS BIGINT) AS shared,
              CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              round(ix * 1.0 / (na + nb - ix), 6) AS jaccard,
              round(ix * 1.0 / least(na, nb), 6) AS containment,
              CAST(CASE WHEN ix * 1.0 / least(na, nb) >= 0.8
                         AND ix * 1.0 / (na + nb - ix) < 0.5
                   THEN 1 ELSE 0 END AS BIGINT) AS near_subset
       FROM scored
       ORDER BY containment DESC, id_a, id_b LIMIT 100"""
  }

  // --------------------------------------------------------------- q410
  /** Bottom-k CONTAINMENT gate — the asymmetric remedy q409's scaladoc
    * promises: each document's k smallest (cold) shingle hashes are a
    * uniform sample of its shingle set, so the count m of those
    * sampled hashes present in another document estimates containment
    * |A∩B|/|A| as m/k — INDEPENDENT of Jaccard, which is exactly what
    * symmetric minhash banding cannot do for subset pairs. Pipeline:
    * hot shingles (in > 200 docs) are capped out first (the
    * boilerplate guard — and the estimator is then containment w.r.t.
    * the capped universe, stated honestly); per-doc bottom-16 via one
    * partitioned window over the capped gram relation; probe rows
    * equi-join the same relation on the hash (fan-out bounded by the
    * cap); pairs with m >= k/2 are verified EXACTLY on the uncapped
    * sets. Everything is integers until the two output ratios.
    * Operator form: [[graft.operators.Dedup.containmentScores]] (this
    * query is that operator on the md5 oracle family plus rounding and
    * a total order); the curation funnel composes the
    * [[graft.operators.Dedup.containmentGate]] filter as its
    * containment_gate stage. */
  private def q410(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    // the operator (promoted from this query's original inline body)
    // on the md5 oracle family; the query adds only rounding + the
    // presentation total order
    Dedup.containmentScores(Tables(s, dir)("documents"), "doc_id", "text",
        shingleLen = 5, k = 16, hotCap = 200, baseHash = Dedup.mdBaseHash)
      .select(col("qid"), col("did"), col("m"),
        round(col("est_containment"), 6).as("est_containment"),
        col("shared"), col("n_q"), col("n_d"),
        round(col("containment"), 6).as("containment"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("containment").desc, col("qid"), col("did"))
      .limit(50)
  }

  private val q410Sql = {
    val K = 16; val Cap = 200
    s"""WITH sh AS (
         SELECT doc_id,
           list_distinct(list_transform(generate_series(1, length(text) - 4),
             i -> substring(text, i, 5))) AS shs
         FROM documents WHERE length(text) >= 5),
       g AS MATERIALIZED (
         SELECT DISTINCT doc_id,
           ('0x' || substr(md5(u.sg), 1, 8))::BIGINT AS h
         FROM sh, unnest(shs) AS u(sg)),
       hot AS (SELECT h FROM g GROUP BY h HAVING count(*) > $Cap),
       gcold AS MATERIALIZED (SELECT doc_id, h FROM g ANTI JOIN hot USING (h)),
       bottoms AS MATERIALIZED (
         SELECT doc_id AS qid, h FROM (
           SELECT doc_id, h,
                  row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rk
           FROM gcold)
         WHERE rk <= $K),
       m AS MATERIALIZED (
         SELECT b.qid, gc.doc_id AS did, count(*) AS m
         FROM bottoms b JOIN gcold gc ON gc.h = b.h AND gc.doc_id <> b.qid
         GROUP BY 1, 2 HAVING count(*) >= ${K / 2}),
       cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
       ix AS (
         SELECT m.qid, m.did, count(*) AS shared
         FROM m JOIN g ga ON ga.doc_id = m.qid
                JOIN g gb ON gb.doc_id = m.did AND gb.h = ga.h
         GROUP BY 1, 2)
       SELECT m.qid, m.did, CAST(m.m AS BIGINT) AS m,
              round(m.m * 1.0 / $K, 6) AS est_containment,
              CAST(ix.shared AS BIGINT) AS shared,
              CAST(cq.n AS BIGINT) AS n_q, CAST(cd.n AS BIGINT) AS n_d,
              round(ix.shared * 1.0 / cq.n, 6) AS containment,
              round(ix.shared * 1.0 / (cq.n + cd.n - ix.shared), 6) AS jaccard
       FROM m JOIN ix ON ix.qid = m.qid AND ix.did = m.did
              JOIN cnt cq ON cq.doc_id = m.qid
              JOIN cnt cd ON cd.doc_id = m.did
       ORDER BY containment DESC, m.qid, m.did LIMIT 50"""
  }

  // --------------------------------------------------------------- q411
  /** EVAL-side contamination report — q75's flip side, the table a
    * benchmark maintainer publishes: per benchmark item (the doc_id %
    * 97 == 0 convention), how many corpus documents share a word
    * 3-gram with it, how many of ITS OWN distinct 3-grams are
    * compromised, the compromised fraction, and the >= 10% flag that
    * retires the item. Same scalable shape as q75: the tiny benchmark
    * side broadcasts, the corpus streams map-side through the
    * inverted-index join, and the rollup keys on the handful of bench
    * ids. */
  private def q411(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val sh = Tables(s, dir)("documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(TextFunctions.wordShingles(col("toks"), 3)).as("sh"))
    val bench = sh.filter(pmod(col("doc_id"), lit(97)) === 0)
      .withColumnRenamed("doc_id", "bench_id")
    val benchCnt = bench.groupBy("bench_id")
      .agg(countDistinct("sh").as("n_grams"))
    val hits = sh.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .join(broadcast(bench), Seq("sh"))
      .groupBy("bench_id")
      .agg(countDistinct("doc_id").as("nc"), countDistinct("sh").as("nh"))
    benchCnt.join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"), col("n_grams").cast("long").as("n_grams"),
        coalesce(col("nc"), lit(0L)).cast("long").as("n_corpus_docs"),
        coalesce(col("nh"), lit(0L)).cast("long").as("n_hit_grams"),
        round(coalesce(col("nh"), lit(0L)).cast("double") / col("n_grams"), 6)
          .as("hit_frac"),
        when(coalesce(col("nh"), lit(0L)).cast("double") / col("n_grams")
          >= 0.1, 1L).otherwise(0L).as("retire"))
      .orderBy("bench_id")
  }

  private val q411Sql = {
    val toksSql = "regexp_split_to_array(trim(text), '\\s+')"
    s"""WITH base AS (
         SELECT doc_id, $toksSql AS toks FROM documents
         WHERE len($toksSql) >= 3),
       sh AS MATERIALIZED (
         SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
         FROM base),
       bcnt AS (
         SELECT doc_id AS bench_id, count(DISTINCT sh) AS n_grams
         FROM sh WHERE doc_id % 97 = 0 GROUP BY 1),
       hits AS (
         SELECT b.doc_id AS bench_id,
                count(DISTINCT c.doc_id) AS nc,
                count(DISTINCT c.sh) AS nh
         FROM sh b JOIN sh c ON c.sh = b.sh
         WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
         GROUP BY 1)
       SELECT bcnt.bench_id,
              CAST(n_grams AS BIGINT) AS n_grams,
              CAST(coalesce(nc, 0) AS BIGINT) AS n_corpus_docs,
              CAST(coalesce(nh, 0) AS BIGINT) AS n_hit_grams,
              round(coalesce(nh, 0) * 1.0 / n_grams, 6) AS hit_frac,
              CAST(CASE WHEN coalesce(nh, 0) * 1.0 / n_grams >= 0.1
                   THEN 1 ELSE 0 END AS BIGINT) AS retire
       FROM bcnt LEFT JOIN hits ON hits.bench_id = bcnt.bench_id
       ORDER BY bcnt.bench_id"""
  }

  // --------------------------------------------------------------- q412
  /** Cross-source SYNDICATION matrix — the whole-document complement
    * of q399's gram containment: for every unordered source pair, how
    * many exact content fingerprints (q64's md5-of-normalized-text
    * convention) appear in BOTH — the republished-verbatim signal that
    * decides which feed is redundant. One distinct over (fp, source),
    * a fingerprint-keyed self-join whose fan-out is bounded by the
    * source count, and the S²/2-row matrix keeps zero-overlap pairs
    * via the tiny count-relation cross join. */
  private def q412(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables(s, dir)("documents")
      .select(md5(encode(
        lower(trim(regexp_replace(col("text"), "\\s+", " "))), "UTF-8"))
        .as("fp"), col("source"))
      .distinct()
    val cnt = fp.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = fp.as("a")
      .join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("sh"))
    val pairs = cnt.select(col("source").as("src_a"), col("n").as("n_a"))
      .crossJoin(cnt.select(col("source").as("src_b"), col("n").as("n_b")))
      .filter(col("src_a") < col("src_b"))
    pairs.join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("sh"), lit(0L)).cast("long").as("n_shared_fp"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        round(coalesce(col("sh"), lit(0L)).cast("double") /
          least(col("n_a"), col("n_b")), 6).as("syndication"))
      .orderBy("src_a", "src_b")
  }

  private val q412Sql =
    """WITH fp AS MATERIALIZED (
         SELECT DISTINCT
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
           source
         FROM documents),
       cnt AS MATERIALIZED (SELECT source, count(*) AS n FROM fp GROUP BY 1),
       sh AS (
         SELECT a.source AS src_a, b.source AS src_b, count(*) AS sh
         FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
         GROUP BY 1, 2),
       pairs AS (
         SELECT ca.source AS src_a, cb.source AS src_b,
                ca.n AS n_a, cb.n AS n_b
         FROM cnt ca CROSS JOIN cnt cb WHERE ca.source < cb.source)
       SELECT src_a, src_b,
              CAST(coalesce(sh.sh, 0) AS BIGINT) AS n_shared_fp,
              CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
              round(coalesce(sh.sh, 0) * 1.0 / least(n_a, n_b), 6)
                AS syndication
       FROM pairs LEFT JOIN sh USING (src_a, src_b)
       ORDER BY src_a, src_b"""

  // --------------------------------------------------------------- q414
  /** ZIPF rank-frequency fit — the power-law companion of q299's
    * Heaps curve: the top-50 corpus unigrams with their rank, a
    * least-squares log-log slope/intercept over the (up to) 50 points — n in the fit is the ACTUAL point count, not the cap, and
    * each point's residual (drift from Zipf flags tokenizer or
    * boilerplate trouble). Determinism discipline: the four fit sums
    * (Σx, Σy, Σxy, Σx²) each fold the rank-SORTED point list
    * sequentially on both engines, slope/intercept are single
    * fixed-order expressions over those sums, and ln's last-ulp
    * engine differences are absorbed by round(6) (the q297/q365
    * precedent). One corpus (word) hash-agg; the 50-point fit is a
    * 1-row scalar cross join. */
  private def q414(s: SparkSession, dir: String): DataFrame = {
    val N = 50
    val freq = Tables(s, dir)("documents")
      .select(explode(SubstringDedup.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val top = freq
      .orderBy(col("freq").desc, col("word")).limit(N)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("word"))))
      .withColumn("x", log(col("rank").cast("double")))
      .withColumn("y", log(col("freq").cast("double")))
    def fold(field: String): org.apache.spark.sql.Column =
      aggregate(
        transform(sort_array(collect_list(struct(col("rank"),
          col("x"), col("y"), (col("x") * col("y")).as("xy"),
          (col("x") * col("x")).as("xx")))),
          e => e.getField(field)),
        lit(0.0), (acc, v) => acc + v)
    val fit = top.agg(count(lit(1)).cast("double").as("n"),
        fold("x").as("sx"), fold("y").as("sy"),
        fold("xy").as("sxy"), fold("xx").as("sxx"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / col("n"))
      .select(col("slope"), col("intercept"))
    top.crossJoin(broadcast(fit))
      .select(col("rank").cast("long").as("rank"), col("word"),
        col("freq").cast("long").as("freq"),
        round(col("y"), 6).as("ln_freq"),
        round(col("slope"), 6).as("slope"),
        round(col("y") - (col("intercept") + col("slope") * col("x")), 6)
          .as("resid"))
      .orderBy("rank")
  }

  private val q414Sql = {
    val N = 50
    s"""WITH freq AS (
         SELECT u.word, count(*) AS freq
         FROM (SELECT list_filter(regexp_split_to_array(lower(text),
                 '[^a-z]+'), w -> w <> '') AS t FROM documents),
              unnest(t) AS u(word)
         GROUP BY 1),
       top AS MATERIALIZED (
         SELECT word, freq,
                row_number() OVER (ORDER BY freq DESC, word) AS rank,
                ln(row_number() OVER (ORDER BY freq DESC, word)) AS x,
                ln(freq) AS y
         FROM freq ORDER BY freq DESC, word LIMIT $N),
       sums AS (
         SELECT CAST(count(*) AS DOUBLE) AS n,
                list_sum(list_transform(list({'r': rank, 'v': x}
                  ORDER BY rank), e -> e.v)) AS sx,
                list_sum(list_transform(list({'r': rank, 'v': y}
                  ORDER BY rank), e -> e.v)) AS sy,
                list_sum(list_transform(list({'r': rank, 'v': x * y}
                  ORDER BY rank), e -> e.v)) AS sxy,
                list_sum(list_transform(list({'r': rank, 'v': x * x}
                  ORDER BY rank), e -> e.v)) AS sxx
         FROM top),
       fit AS (
         SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
                sx, sy, n
         FROM sums),
       fit2 AS (SELECT slope, (sy - slope * sx) / n AS intercept FROM fit)
       SELECT CAST(rank AS BIGINT) AS rank, word,
              CAST(freq AS BIGINT) AS freq,
              round(y, 6) AS ln_freq,
              round(slope, 6) AS slope,
              round(y - (intercept + slope * x), 6) AS resid
       FROM top CROSS JOIN fit2
       ORDER BY rank"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q406_dsir_weights" -> q406 _,
    "q409_containment_dedup" -> q409 _,
    "q410_containment_gate" -> q410 _,
    "q411_eval_compromise" -> q411 _,
    "q412_syndication" -> q412 _,
    "q414_zipf_fit" -> q414 _)

  override def oracles: Map[String, String] = Map(
    "q406_dsir_weights" -> q406Sql,
    "q409_containment_dedup" -> q409Sql,
    "q410_containment_gate" -> q410Sql,
    "q411_eval_compromise" -> q411Sql,
    "q412_syndication" -> q412Sql,
    "q414_zipf_fit" -> q414Sql)
}
