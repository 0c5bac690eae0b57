package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.functions.expressions.DotProduct.vecDot
import graft.operators.{IvfPq, ModelStore, QualityClassifier, Similarity}

/** Round-13 pack: the artifact-lifecycle tier — the last trust gaps
  * the round-12 verdict found before an operator would run this engine
  * unattended at 100 TB.
  *
  * q477: the ANN recall audit (q472) extended to IVF-PQ — the one
  * registered method with quantization distortion, so its audit also
  * prices the ADC approximation error itself (Jégou et al. 2011 §V
  * report exactly this recall-vs-distortion pair).
  * q478: the quality classifier's weights FIT IN-ENGINE (bounded-sample
  * IRLS, the fastText wiki-vs-crawl recipe distilled onto the q112
  * rule gate) and served THROUGH the persisted-model contract.
  * q479: q474's in-batch false-negative audit re-run over the batch
  * assignments the pipeline actually emits — sequential, md5-shuffled
  * (q455), and curriculum-interleaved (q458/q469) — one row per
  * policy, because tier-balanced orderings can concentrate same-family
  * docs where the shuffled audit says they cannot.
  * q480: serve-from-disk ≡ serve-from-fit, pinned end-to-end — the
  * IVF-PQ model round-trips through [[graft.operators.ModelStore]] and
  * the persisted-serve output is oracled against q358's committed
  * golden bit-for-bit.
  *
  * Oracle discipline: q477/q478 depend on driver-local fits whose
  * Lloyd/IRLS arithmetic DuckDB cannot replay relationally, so they
  * carry committed golden-parquet oracles (the q346/q358 scheme:
  * 6-dp-rounded fitted state, id tie-breaks, order-free integer-micros
  * sums — bit-reproducible across configs, freshness re-asserted every
  * `sbt test` by GoldenScaleSpec). q479 is fully SQL-replayed on the
  * shared OracleSketch fragments. q480's oracle IS q358's golden.
  */
object Extras73 extends QueryPack {

  private val Dim = 64

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("embeddings")

  // --------------------------------------------------------------- q477
  /** IVF-PQ RECALL + DISTORTION AUDIT — q472's missing row: recall@1
    * and recall@5 of [[IvfPq.topK]] (the q358 production config:
    * coarseK=8, m=8, codes=16, nprobe=4) against the brute-force truth
    * over the same ABSOLUTELY bounded query sample
    * ([[Extras72.auditSample]]: smallest-K md5, K·N truth cost), PLUS the
    * quantization-distortion price no other method pays: the mean
    * |ADC-implied cosine − exact cosine| over the returned pairs
    * (adist ≈ |q − v̂|², so cos_adc = (|q|² + |v|² − adist) / 2|q||v| —
    * the FAISS asymmetric-distance identity read back as a cosine).
    *
    * Scale shape: the truth leg runs over the K-row query sample
    * only; the ADC leg is the nprobe-pruned bucket equi-join (corpus
    * never shuffles); the error leg joins the k·|queries| result rows
    * back to the two vector sides — bounded — and the distortion mean
    * is an order-free integer-micros sum. Golden-oracled (driver-local
    * Lloyd fits; the q358 determinism fence applies).
    *
    * Expected finding on THIS corpus: the testdata embeddings are
    * unit-norm i.i.d.-random vectors — incompressible, the PQ worst
    * case — so at m=8/codes=16 the audit reports recall@5 ≈ 0.1-0.3
    * and mean cosine distortion ≈ 0.28-0.32. That low number is the
    * audit working as intended (q472's un-quantized methods score far
    * higher on the same sample): it is the signal that this config
    * needs more codes / more subspaces / an exact-vector rerank before
    * its candidates are trusted — precisely the decision table Jégou
    * et al.'s IVFADC experiments tabulate. */
  private def q477(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val queries = Extras72.auditSample(all)
    val model = IvfPq.fit(all, "vec_id", "embedding",
      dim = Dim, coarseK = 8, m = 8, codes = 16, iters = 3)
    val enc = IvfPq.encode(all, "vec_id", "embedding", model)
    val approx = IvfPq.topK(enc, queries, "vec_id", "embedding",
        model, k = 5, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
      .localCheckpoint() // k·|queries| rows, read by hit + error legs
    val exact = Similarity
      .bruteForceTopK(all, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("ex_rank"))
      .localCheckpoint()

    val hits = approx.join(exact, Seq("query_id", "neighbor_id"))
      .agg(
        coalesce(sum(when(col("rank") <= 1 && col("ex_rank") <= 1, 1L)
          .otherwise(0L)), lit(0L)).as("h1"),
        count(lit(1)).as("h5"))
    val truth = exact.agg(
      coalesce(sum(when(col("ex_rank") <= 1, 1L).otherwise(0L)), lit(0L))
        .as("e1"),
      count(lit(1)).as("e5"))

    // distortion leg: exact vs ADC-implied cosine per returned pair
    val vecs = all.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val withQ = approx.join(
      broadcast(vecs.select(col("vec_id").as("query_id"), col("v").as("qv"))),
      Seq("query_id"))
    val pairs = vecs.select(col("vec_id").as("neighbor_id"),
        col("v").as("nv"))
      .join(broadcast(withQ), Seq("neighbor_id"))
    val qn2 = vecDot(col("qv"), col("qv"))
    val nn2 = vecDot(col("nv"), col("nv"))
    val denom = lit(2.0) * sqrt(qn2) * sqrt(nn2)
    // zero-norm guard (the topKRefined convention): a zero vector's
    // cosine is 0, not NaN — NaN micros would cast to null and
    // silently drop from the integer-micros sum
    val cosExact = when(denom === 0.0, 0.0)
      .otherwise(lit(2.0) * vecDot(col("qv"), col("nv")) / denom)
    val cosAdc = when(denom === 0.0, 0.0)
      .otherwise((qn2 + nn2 - col("adist")) / denom)
    val micros = floor(abs(cosAdc - cosExact) * 1e6 + 0.5).cast("long")
    val err = pairs.agg(
      coalesce(sum(when(col("rank") <= 1, micros)), lit(0L)).as("s1"),
      coalesce(sum(when(col("rank") <= 1, 1L).otherwise(0L)), lit(0L))
        .as("m1"),
      coalesce(sum(micros), lit(0L)).as("s5"),
      count(lit(1)).as("m5"))

    hits.crossJoin(broadcast(truth)).crossJoin(broadcast(err))
      .select(explode(array(
        struct(lit(1).as("k"), col("h1").as("nh"), col("e1").as("ne"),
          col("s1").as("se"), col("m1").as("me")),
        struct(lit(5).as("k"), col("h5").as("nh"), col("e5").as("ne"),
          col("s5").as("se"), col("m5").as("me")))).as("r"))
      .select(lit("ivfpq").as("method"),
        col("r.k").cast("int").as("k"),
        col("r.nh").cast("long").as("n_hits"),
        col("r.ne").cast("long").as("n_truth"),
        round(col("r.nh").cast("double") / col("r.ne"), 6).as("recall"),
        round(col("r.se").cast("double")
          / (greatest(col("r.me"), lit(1L)) * 1e6), 6).as("mean_cos_err"))
      .orderBy("k")
  }

  private val q477Sql = GoldenOracle.sql("q477_ivfpq_recall",
    "method, k, n_hits, n_truth, recall, mean_cos_err", "k")

  // --------------------------------------------------------------- q478
  /** IN-ENGINE CLASSIFIER FIT + PERSISTED SERVE — the fastText-style
    * quality filter's weights fit by [[QualityClassifier.fit]]
    * (bounded-sample IRLS; the weak label is the q64 funnel's rule
    * gate — n_chars ∈ [64, 4096] ∧ ≥ 8 tokens — so the fit DISTILLS
    * the hand rule stack into the learned linear surface, the
    * wiki-vs-crawl recipe with the rule gate as the teacher). Weights
    * round-trip through [[ModelStore]] (save → load) and the HELD-OUT
    * 20% md5 bucket is scored with the LOADED weights — so the query
    * exercises the full train-once/persist/serve contract, not just
    * the fit. Output: one row per fitted weight (6 dp) plus the
    * held-out n / correct / accuracy rows (exact integers, one
    * rounded division).
    *
    * Scale shape: ONE bounded top-S sample job + a (d+1)² driver
    * solve; the holdout score is a zero-shuffle projection + one
    * hash-agg. Golden-oracled (the IRLS solve is driver arithmetic
    * DuckDB cannot replay; determinism fenced in fit's scaladoc). */
  private def q478(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables(s, dir)("documents")
    val feats = QualityClassifier.defaultFeatures(col("text"))
    val y = (col("n_chars") >= 64 && col("n_chars") <= 4096 &&
      size(TextFunctions.tokens(col("text"))) >= 8).cast("double")
    val bucket = pmod(conv(substring(md5(concat(lit("fit:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(5))
    val train = d.filter(bucket =!= 0)
    val holdout = d.filter(bucket === 0)

    val fitted = QualityClassifier.fit(train, "doc_id", y, feats,
      iters = 4, sampleSize = 2000)
    // cluster-reachable artifact root (warehouse-relative), overwritten
    // per run — the query is shaped like the deployment it models
    val path = ModelStore.artifactPath(s, "q478_classifier")
    ModelStore.saveLogistic(s, feats.map(_._1), fitted, path)
    val (loadedNames, loadedW) = ModelStore.loadLogistic(s, path)

    val wRows = ("bias" +: loadedNames).zip(loadedW).zipWithIndex
      .map { case ((n, w), i) => (s"w${i}_$n", w) }
    val wDf = wRows.toDF("name", "value")
    val logit = QualityClassifier.logitExpr(
      QualityClassifier.fittedModel(col("text"), loadedW))
    val accRows = holdout.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when((logit >= 0) === (y === 1.0), 1L).otherwise(0L)),
          lit(0L)).as("c"))
      .select(explode(array(
        struct(lit("holdout_acc").as("name"),
          round(col("c").cast("double") / col("n"), 6).as("value")),
        struct(lit("holdout_correct").as("name"),
          col("c").cast("double").as("value")),
        struct(lit("holdout_n").as("name"),
          col("n").cast("double").as("value")))).as("r"))
      .select(col("r.name").as("name"), col("r.value").as("value"))
    wDf.unionAll(accRows).orderBy("name")
  }

  private val q478Sql = GoldenOracle.sql("q478_classifier_fit",
    "name, value", "name")

  // --------------------------------------------------------------- q479
  /** BATCH-COLLISION AUDIT ACROSS SHARD POLICIES — q474 priced the
    * md5-shuffled assignment; this prices every B=32 batch order the
    * pipeline can actually emit over the q465 training slice:
    * `sequential` (raw doc_id order — the naive baseline, where
    * near-dup families sit on adjacent ids), `shuffled` (q455's md5
    * global shuffle), and `curriculum` (the q458/q471 interleave
    * consumed in its `ord` reading order — the one a tier-balanced
    * loader really feeds the trainer, and the one that can re-cluster
    * same-difficulty near-dups). Same family relation as q474 (q26
    * md5-minhash pairs → spanning-forest components); one row per
    * policy.
    *
    * Scale shape: families build once (localCheckpointed id→component,
    * bounded); each policy is one RowIndexer range shuffle (the
    * curriculum one via the same interleave the loader uses); the
    * audit is m·(m−1)/2 integer arithmetic on stacked (batch, family)
    * hash-aggs — no pair join for any policy. */
  private def q479(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ConnectedComponents, Curriculum, Dedup, RowIndexer}
    val d = Tables(s, dir)("documents")
      .filter(pmod(col("doc_id"), lit(5)) === 0)
    val pairs = Dedup.minhashDedupMd5(d, "doc_id", "text")
      .select(col("id_a"), col("id_b"))
    val fams = ConnectedComponents.components(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component"))
      .localCheckpoint() // bounded id→family map, read by all 3 audits
    val base = d.select(col("doc_id"), col("n_chars"),
        md5(concat(lit("shd:"), col("doc_id").cast("string"))).as("skey"))
      .localCheckpoint() // slim 3-column frame, 3 policy orders read it

    def audit(policy: String, assigned: DataFrame): DataFrame =
      assigned.join(fams, Seq("doc_id"), "left")
        .select(col("batch"),
          coalesce(col("component"), col("doc_id")).as("fam"))
        .groupBy("batch", "fam").agg(count(lit(1)).as("m"))
        .groupBy("batch").agg(sum(expr("m * (m - 1) DIV 2")).as("coll"))
        .agg(count(lit(1)).as("nb"), sum("coll").as("cp"),
          sum(when(col("coll") > 0, 1L).otherwise(0L)).as("bc"))
        .select(lit(policy).as("policy"),
          col("nb").cast("long").as("n_batches"),
          col("cp").cast("long").as("collision_pairs"),
          col("bc").cast("long").as("batches_with_collision"),
          round(col("cp").cast("double") / col("nb"), 6)
            .as("collisions_per_batch"))

    val sequential = RowIndexer
      .stableIndex(base.select("doc_id"), Seq(col("doc_id")))
      .select(col("doc_id"), expr("idx DIV 32").as("batch"))
    val shuffled = RowIndexer
      .stableIndex(base.select("doc_id", "skey"),
        Seq(col("skey"), col("doc_id")))
      .select(col("doc_id"), expr("idx DIV 32").as("batch"))
    val curriculum = Curriculum
      .interleave(base.select("doc_id", "n_chars"), "doc_id", "n_chars",
        tiers = 4)
      .select(col("doc_id"), expr("ord DIV 32").as("batch"))

    audit("curriculum", curriculum)
      .unionAll(audit("sequential", sequential))
      .unionAll(audit("shuffled", shuffled))
      .orderBy("policy")
  }

  private val q479Sql: String = {
    def polStats(name: String, asgCte: String) =
      s"""SELECT '$name' AS policy,
            CAST(count(*) AS BIGINT) AS n_batches,
            CAST(sum(coll) AS BIGINT) AS collision_pairs,
            CAST(sum(CASE WHEN coll > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS batches_with_collision,
            round(CAST(sum(coll) AS DOUBLE) / count(*), 6)
              AS collisions_per_batch
          FROM (
            SELECT batch, sum(m * (m - 1) // 2) AS coll FROM (
              SELECT batch, COALESCE(component, i.doc_id) AS fam,
                count(*) AS m
              FROM $asgCte i LEFT JOIN cc_fam USING (doc_id)
              GROUP BY 1, 2) g
            GROUP BY 1) pb"""
    s"""WITH RECURSIVE ${OracleSketch.minhashCtes("doc_id % 5 = 0")},
       edges AS (SELECT id_a, id_b FROM mh_est WHERE e >= 0.2),
       ${OracleSketch.componentsCtes("edges")},
       keyed AS MATERIALIZED (
         SELECT doc_id, n_chars,
           md5('shd:' || CAST(doc_id AS VARCHAR)) AS skey
         FROM documents WHERE doc_id % 5 = 0),
       seq_a AS (
         SELECT doc_id,
           (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 32 AS batch
         FROM keyed),
       shf_a AS (
         SELECT doc_id,
           (ROW_NUMBER() OVER (ORDER BY skey, doc_id) - 1) // 32 AS batch
         FROM keyed),
       cur0 AS (
         SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS idx,
           COUNT(*) OVER () AS n
         FROM keyed),
       cur1 AS (SELECT doc_id, idx, n, (idx * 4) // n AS tier FROM cur0),
       cur_a AS (
         SELECT doc_id,
           ((idx - (tier * n + 3) // 4) * 4 + tier) // 32 AS batch
         FROM cur1)
       ${polStats("curriculum", "cur_a")}
       UNION ALL
       ${polStats("sequential", "seq_a")}
       UNION ALL
       ${polStats("shuffled", "shf_a")}
       ORDER BY policy"""
  }

  // --------------------------------------------------------------- q480
  /** PERSISTED-INDEX SERVE — q358's IVF-PQ query with the model routed
    * through the [[ModelStore]] lifecycle: fit → save (parquet
    * artifacts + manifest) → LOAD → encode/probe with the loaded
    * model. The oracle is q358's OWN committed golden, so the driver
    * compare asserts the contract a 100 TB deployment relies on:
    * serving from the persisted artifact is BIT-IDENTICAL to serving
    * from the fresh fit (parquet round-trips the 6-dp doubles
    * exactly; load re-orders by stored ids, not file order). */
  private def q480(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val model = IvfPq.fit(all, "vec_id", "embedding",
      dim = Dim, coarseK = 8, m = 8, codes = 16, iters = 3)
    val path = ModelStore.artifactPath(s, "q480_ivfpq")
    ModelStore.saveIvfPq(s, model, path)
    val loaded = ModelStore.loadIvfPq(s, path)
    val enc = IvfPq.encode(all, "vec_id", "embedding", loaded)
    IvfPq.topK(enc, all.filter(col("vec_id") < 10), "vec_id", "embedding",
        loaded, k = 5, nprobe = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adist"), 6).as("adist"))
      .orderBy("query_id", "rank")
  }

  private val q480Sql = GoldenOracle.sql("q358_ivfpq_ann",
    "query_id, rank, neighbor_id, adist", "query_id, rank")

  override val queries: Map[String, QueryFn] = Map(
    "q477_ivfpq_recall" -> q477 _,
    "q478_classifier_fit" -> q478 _,
    "q479_shard_collisions" -> q479 _,
    "q480_persisted_ann" -> q480 _)

  override val oracles: Map[String, String] = Map(
    "q477_ivfpq_recall" -> q477Sql,
    "q478_classifier_fit" -> q478Sql,
    "q479_shard_collisions" -> q479Sql,
    "q480_persisted_ann" -> q480Sql)
}
