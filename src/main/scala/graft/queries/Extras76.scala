package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{IvfPq, ModelStore, QualityClassifier, Similarity}

/** Round-14 pack: closing the control loops the round-13 audits left
  * open — q484 measured the calibration gap, q485 measured drift at
  * the door, q477/q483 priced two points of the ANN tuning surface;
  * nothing yet CLOSED the gap, remembered the training distribution,
  * or tabulated the tuning decision. These three do.
  *
  * q486: Platt-scaled score recalibration — the 2-parameter post-hoc
  * fix (Platt 1999; Guo et al. 2017's strong baseline) fit in-engine
  * on a held-out calibration split, persisted through [[ModelStore]],
  * and audited with q484's own reliability-table shape for BOTH the
  * raw and recalibrated score, so the per-decile |gap| shrink is a
  * committed, driver-checked number.
  * q487: PSI vs the ARTIFACT — q485 compares live corpus vs candidate
  * shard; the model's real question is drift vs what it was TRAINED
  * on. The classifier artifact now carries its fit sample's 10-decile
  * score histogram ([[ModelStore.saveLogistic]]); this query reads the
  * histogram back from disk and prices the live corpus against it.
  * q488: the nprobe/kCandidates decision table — recall@1/@5 and the
  * scanned corpus fraction per index config (the Jégou et al. 2011
  * IVFADC experiment table as a relation), over the same absolute
  * smallest-K query sample as q472/q477/q483.
  *
  * Oracle discipline: q487 is FULLY SQL-replayed (the default weights
  * are literals and the fit-sample histogram is the smallest-2000
  * md5(doc_id) sample — both relational); q486/q488 depend on
  * driver-local IRLS/Lloyd fits, so they carry committed goldens (the
  * q477/q478 scheme, freshness re-asserted by GoldenScaleSpec).
  */
object Extras76 extends QueryPack {

  /** The q484 rule-gate label: the teacher the classifier distills. */
  private def ruleLabel: Column =
    (col("n_chars") >= 64 && col("n_chars") <= 4096 &&
      size(TextFunctions.tokens(col("text"))) >= 8).cast("long")

  /** q484's reliability table over a 6-dp score column, with a
    * variant stamp: per decile, count, mean predicted score (order-free
    * integer-micros sum), observed positive rate, |gap|. */
  private def reliability(d: DataFrame, variant: String,
                          score: Column): DataFrame =
    d.select(score.as("s"), ruleLabel.as("y"))
      .select(least(floor(col("s") * 10), lit(9.0)).cast("int").as("bin"),
        floor(col("s") * 1e6 + 0.5).cast("long").as("sm"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("sm").as("sms"), sum("y").as("np"))
      .select(lit(variant).as("variant"), col("bin"),
        col("n").cast("long").as("n_docs"),
        round(col("sms").cast("double") / (col("n") * 1e6), 6)
          .as("mean_score"),
        round(col("np").cast("double") / col("n"), 6).as("pos_rate"),
        round(abs(col("sms").cast("double") / (col("n") * 1e6)
          - col("np").cast("double") / col("n")), 6).as("abs_gap"))

  // --------------------------------------------------------------- q486
  /** SCORE RECALIBRATION (Platt scaling) — q484 showed the hand-set
    * classifier's score is NOT a probability (per-decile gaps up to
    * the whole bin width); this closes it: fit sigmoid(a + b·z) to the
    * rule label on a held-out calibration split
    * ([[QualityClassifier.fitCalibration]] — the bounded-sample IRLS
    * at d=1), persist (a, b) through the [[ModelStore]] logistic
    * contract, serve from the LOADED weights, and emit the reliability
    * table for BOTH variants — q484's exact row shape plus the variant
    * stamp, so raw-vs-calibrated reads as adjacent rows and the
    * per-decile |gap| shrink is driver-checked.
    *
    * Scale shape: the fit is ONE bounded top-S sample job + a 3×3
    * driver solve; each table is a zero-shuffle featurize→sigmoid
    * projection + a 10-row hash-agg; the artifact round-trip is
    * model-bytes-sized. Golden-oracled (driver IRLS; q478's fence). */
  private def q486(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val z = QualityClassifier.logitExpr(
      QualityClassifier.defaultModel(col("text")))
    // held-out calibration split: the "cal:" md5 1-in-5 bucket (the
    // q478 "fit:" scheme with its own salt, so the two splits are
    // independent)
    val calBucket = pmod(conv(substring(md5(concat(lit("cal:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(5))
    val ab = QualityClassifier.fitCalibration(
      d.filter(calBucket === 0), "doc_id", ruleLabel.cast("double"), z,
      iters = 8, sampleSize = 2000)
    val path = ModelStore.artifactPath(s, "q486_platt")
    ModelStore.saveLogistic(s, Seq("logit"), ab, path)
    val (_, loaded) = ModelStore.loadLogistic(s, path)
    val raw = round(QualityClassifier.scoreExpr(
      QualityClassifier.defaultModel(col("text"))), 6)
    val cal = round(QualityClassifier.calibratedScoreExpr(z, loaded), 6)
    reliability(d, "calibrated", cal)
      .unionAll(reliability(d, "raw", raw))
      .orderBy("variant", "bin")
  }

  private val q486Sql = GoldenOracle.sql("q486_score_recalibration",
    "variant, bin, n_docs, mean_score, pos_rate, abs_gap", "variant, bin")

  // --------------------------------------------------------------- q487
  /** DRIFT VS THE TRAINING DISTRIBUTION — q485's PSI gate compares two
    * slices of the LIVE corpus; the question a serving pipeline
    * actually asks is "does today's corpus still look like what the
    * model was TRAINED on?". The classifier artifact now remembers:
    * [[ModelStore.saveLogistic]] carries the fit sample's 10-decile
    * score histogram in the manifest, and this query reads it BACK
    * from the persisted artifact and prices the live corpus against
    * it — per decile, artifact count vs live count, both fractions,
    * and the (p−q)·ln(p/q) PSI term with the standard 1e-6 floor
    * (train = reference p, live = candidate q; Σ < 0.1 = "no retrain
    * needed" by the conventional bar).
    *
    * The fit sample is the smallest-2000 md5(doc_id) rows (the
    * [[QualityClassifier.fit]] sampling discipline via
    * [[Similarity.hashSample]]) scored with the default literal
    * weights — every leg relational, so unlike q486 this oracle is
    * FULLY SQL-replayed: DuckDB re-derives the histogram that went
    * INTO the artifact and the driver compare proves the round-trip
    * returned it bit-for-bit.
    *
    * Scale shape: one bounded top-S sample job → 10-row hash-agg →
    * 10 integers in the manifest (write once, at fit time); the live
    * side is one zero-shuffle projection + a 10-row hash-agg + the
    * literal bin spine against a broadcast scalar — drift-vs-training
    * is priced without ever re-touching the training corpus. */
  private def q487(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables(s, dir)("documents")
    val score = round(QualityClassifier.scoreExpr(
      QualityClassifier.defaultModel(col("text"))), 6)
    val binCol = least(floor(score * 10), lit(9.0)).cast("int")
    val histMap = Similarity.hashSample(d, "doc_id", 2000)
      .select(binCol.as("bin")).groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hist = (0 until 10).map(b => histMap.getOrElse(b, 0L))
    val path = ModelStore.artifactPath(s, "q487_clf_hist")
    ModelStore.saveLogistic(s,
      QualityClassifier.defaultFeatures(col("text")).map(_._1),
      QualityClassifier.DefaultWeights, path, hist)
    // serve side: ONLY the loaded artifact histogram, never `hist`
    val loaded = ModelStore.loadLogisticHist(s, path)
    val trainTotal = loaded.sum.toDouble
    val train = loaded.zipWithIndex
      .map { case (n, b) => (b, n) }.toDF("bin", "nt")
    val live = d.select(binCol.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("nl"))
    val totals = live.agg(sum("nl").as("nlt"))
    val spine = s.range(10).select(col("id").cast("int").as("bin"))
    val p = greatest(col("nt").cast("double") / trainTotal, lit(1e-6))
    val q = greatest(col("nl").cast("double") / col("nlt"), lit(1e-6))
    spine.join(broadcast(train), Seq("bin"), "left")
      .join(live, Seq("bin"), "left")
      .na.fill(0L, Seq("nt", "nl"))
      .crossJoin(broadcast(totals))
      .select(col("bin"),
        col("nt").cast("long").as("n_train"),
        col("nl").cast("long").as("n_live"),
        round(col("nt").cast("double") / trainTotal, 6).as("train_frac"),
        round(col("nl").cast("double") / col("nlt"), 6).as("live_frac"),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy("bin")
  }

  private val q487Sql: String =
    s"""WITH f AS (
         ${OracleLogit.featuresSql("doc_id")}),
       z AS (
         SELECT doc_id,
           ${OracleLogit.zExprSql} AS z
         FROM f),
       sc AS MATERIALIZED (
         SELECT doc_id,
           CAST(least(floor(round(1.0 / (1.0 + exp(-z)), 6) * 10), 9.0)
             AS INT) AS bin
         FROM z),
       smp AS MATERIALIZED (
         SELECT doc_id FROM documents
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 2000),
       tb AS (SELECT bin, count(*) AS nt
              FROM sc JOIN smp USING (doc_id) GROUP BY 1),
       lb AS (SELECT bin, count(*) AS nl FROM sc GROUP BY 1),
       tot AS (SELECT (SELECT count(*) FROM smp) AS ntt,
                      (SELECT count(*) FROM sc) AS nlt),
       spine AS (SELECT CAST(g AS INT) AS bin
                 FROM unnest(generate_series(0, 9)) AS t(g)),
       j AS (
         SELECT spine.bin,
           COALESCE(nt, 0) AS nt, COALESCE(nl, 0) AS nl, ntt, nlt,
           greatest(CAST(COALESCE(nt, 0) AS DOUBLE) / ntt, 1e-6) AS p,
           greatest(CAST(COALESCE(nl, 0) AS DOUBLE) / nlt, 1e-6) AS q
         FROM spine LEFT JOIN tb ON tb.bin = spine.bin
                    LEFT JOIN lb ON lb.bin = spine.bin
                    CROSS JOIN tot)
       SELECT bin, CAST(nt AS BIGINT) AS n_train,
         CAST(nl AS BIGINT) AS n_live,
         round(CAST(nt AS DOUBLE) / ntt, 6) AS train_frac,
         round(CAST(nl AS DOUBLE) / nlt, 6) AS live_frac,
         round((p - q) * ln(p / q), 6) AS psi_term
       FROM j ORDER BY bin"""

  // --------------------------------------------------------------- q488
  /** IVF-PQ TUNING DECISION TABLE — q477 priced ONE config's recall
    * and q483 priced one rerank; an operator tuning the index wants
    * the SWEEP: per (nprobe, kCandidates), recall@1/@5 of the
    * refined path against the shared brute truth AND the fraction of
    * the corpus the ADC stage actually scans (the probed buckets'
    * occupancy — the cost axis recall is traded against; Jégou et al.
    * 2011 §V tabulate exactly this pair). Four nprobe points at the
    * production kCandidates plus the kCandidates wings at nprobe=4.
    *
    * Scale shape: the model fits once, the corpus encodes once
    * (localCheckpointed — at 100 TB this is the persisted
    * partitionBy(bucket) table), the truth leg runs once over the
    * absolute smallest-K sample; each config adds one nprobe-pruned
    * ADC scan + one bounded rerank join; the scanned-fraction leg is
    * the (query × nprobe) probe list joined to the 8-row bucket
    * occupancy — integer arithmetic, no vector math. Golden-oracled
    * (driver Lloyd fits). */
  private def q488(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.expressions.DotProduct.vecDot
    val all = Tables(s, dir)("embeddings")
    val queries = Extras72.auditSample(all).localCheckpoint()
    val model = IvfPq.fit(all, "vec_id", "embedding",
      dim = 64, coarseK = 8, m = 8, codes = 16, iters = 3)
    val enc = IvfPq.encode(all, "vec_id", "embedding", model)
      .localCheckpoint() // read by the shared ADC scan + occupancy
    val exact = Similarity
      .bruteForceTopK(all, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("ex_rank"))
      .localCheckpoint()
    val truth = exact.agg(
        coalesce(sum(when(col("ex_rank") <= 1, 1L).otherwise(0L)), lit(0L))
          .as("e1"),
        count(lit(1)).as("e5"))
      .localCheckpoint()
    val bucketN = enc.groupBy("bucket").agg(count(lit(1)).as("bn"))
    val corpusN = all.count()
    val nQueries = queries.count()

    // The sweep shares ONE maximal ADC scan instead of one per config:
    // probes() lists buckets in ascending (distance, bucket) order, so
    // probe_rank < n reproduces the nprobe = n probe set exactly, and
    // every config's candidate stage is a filter + bounded window over
    // the SAME checkpointed (query, neighbor, probe_rank, adist) rows.
    // Before: 6 configs × (nprobe/8 of the corpus) ADC evaluations
    // (23/8 of a full scan, plus 6 rerank corpus joins); after: one
    // 8/8 scan, one rerank join over the union of candidate sets.
    val configs = Seq((1, 64), (2, 64), (4, 16), (4, 64), (4, 128), (8, 64))
    val maxNp = configs.map(_._1).max
    val scoredAll = IvfPq.adcScan(enc, queries, "vec_id", "embedding",
        model, maxNp)
      .localCheckpoint()
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    def candidates(nprobe: Int, kCand: Int): DataFrame =
      scoredAll.filter(col("probe_rank") < nprobe)
        .select(col("query_id"), col("neighbor_id"), col("adist"))
        .withColumn("__rk", row_number().over(wAdc))
        .filter(col("__rk") <= kCand)
        .select(col("query_id"), col("neighbor_id"))

    // ONE exact-cosine rerank join over the UNION of every config's
    // candidates (cos per pair is config-independent; each config then
    // re-ranks its own subset — bit-identical to a per-config rerank)
    val candAll = configs.map { case (np, kc) => candidates(np, kc) }
      .reduce(_ unionAll _).distinct() // single consumer (the cos join)
    val qv = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("__qv"))
    val cv = all.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("__cv"))
    val qn = sqrt(vecDot(col("__qv"), col("__qv")))
    val cn = sqrt(vecDot(col("__cv"), col("__cv")))
    val cosc = when(qn * cn === 0.0, 0.0)
      .otherwise(vecDot(col("__qv"), col("__cv")) / (qn * cn))
    val cosAll = cv
      .join(broadcast(candAll.join(broadcast(qv), Seq("query_id"))),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosc.as("cos"))
      .localCheckpoint()
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))

    // scanned-fraction leg, shared: probe-ranked bucket occupancy once
    val probeOcc = queries
      .select(col("vec_id").as("query_id"),
        posexplode(IvfPq.probes(col("embedding").cast("array<double>"),
          model, maxNp)))
      .withColumnRenamed("pos", "probe_rank")
      .withColumnRenamed("col", "bucket")
      .join(broadcast(bucketN), Seq("bucket"))
      .select(col("probe_rank"), col("bn"))
      .localCheckpoint()

    def config(nprobe: Int, kCand: Int): DataFrame = {
      val refined = candidates(nprobe, kCand)
        .join(cosAll, Seq("query_id", "neighbor_id"))
        .withColumn("rank", row_number().over(wCos))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").as("ap_rank"))
      val hits = refined.join(exact, Seq("query_id", "neighbor_id"))
        .agg(
          coalesce(sum(when(col("ap_rank") <= 1 && col("ex_rank") <= 1, 1L)
            .otherwise(0L)), lit(0L)).as("h1"),
          count(lit(1)).as("h5"))
      // scanned rows = Σ over (query, probed bucket) of the bucket's
      // occupancy; fraction normalizes by |queries|·N
      val scanned = probeOcc.filter(col("probe_rank") < nprobe)
        .agg(coalesce(sum("bn"), lit(0L)).as("ns"))
      hits.crossJoin(broadcast(truth)).crossJoin(broadcast(scanned))
        .select(explode(array(
          struct(lit(1).as("k"), col("h1").as("nh"), col("e1").as("ne")),
          struct(lit(5).as("k"), col("h5").as("nh"), col("e5").as("ne"))))
          .as("r"), col("ns"))
        .select(lit(nprobe).as("nprobe"),
          lit(kCand).as("k_candidates"),
          col("r.k").cast("int").as("k"),
          col("r.nh").cast("long").as("n_hits"),
          col("r.ne").cast("long").as("n_truth"),
          round(col("r.nh").cast("double") / col("r.ne"), 6).as("recall"),
          round(col("ns").cast("double") / (nQueries * corpusN), 6)
            .as("scanned_frac"))
    }

    configs
      .map { case (np, kc) => config(np, kc) }
      .reduce(_ unionAll _)
      .orderBy("nprobe", "k_candidates", "k")
  }

  private val q488Sql = GoldenOracle.sql("q488_ivfpq_tuning",
    "nprobe, k_candidates, k, n_hits, n_truth, recall, scanned_frac",
    "nprobe, k_candidates, k")

  // --------------------------------------------------------------- q489
  /** ISOTONIC RECALIBRATION — the non-parametric rung under q486's
    * Platt rung (Guo et al. 2017 benchmark both; isotonic wins when
    * the miscalibration is not sigmoid-shaped): per raw-score decile
    * the observed rule-label rate, PAV-pooled into a monotone step
    * function ([[QualityClassifier.fitIsotonicDeciles]] — sufficient
    * statistic is ONE 10-row hash-agg, no sample needed), persisted
    * through the [[ModelStore]] isotonic artifact, and SERVED from the
    * loaded steps. Output: the calibrated score's reliability table in
    * q486's variant-stamped shape, so q484/q486/q489 stack into the
    * calibration ladder read-off.
    *
    * Scale shape: the fit is one 10-row hash-agg + a ≤10-block driver
    * PAV on cross-multiplied longs; serve is one floor + one
    * literal-array lookup per row. Golden-oracled (the PAV pooling is
    * driver arithmetic DuckDB cannot replay relationally). */
  private def q489(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val raw = round(QualityClassifier.scoreExpr(
      QualityClassifier.defaultModel(col("text"))), 6)
    val steps = QualityClassifier.fitIsotonicDeciles(d, ruleLabel, raw)
    val path = ModelStore.artifactPath(s, "q489_isotonic")
    ModelStore.saveIsotonic(s, steps, path)
    val loaded = ModelStore.loadIsotonic(s, path)
    val cal = round(QualityClassifier.isotonicScoreExpr(raw, loaded), 6)
    reliability(d, "isotonic", cal).orderBy("bin")
  }

  private val q489Sql = GoldenOracle.sql("q489_isotonic_recalibration",
    "variant, bin, n_docs, mean_score, pos_rate, abs_gap", "bin")

  // --------------------------------------------------------------- q490
  /** CALIBRATION SCORECARD — the Guo et al. 2017 summary table as a
    * relation: per variant (raw / platt / isotonic), the expected
    * calibration error (decile-weighted |gap|), the maximum
    * calibration error, and the Brier score, over the same corpus and
    * rule label. This is the one-page read-off that picks the
    * calibrator; q484/q486/q489 show the per-decile detail behind it.
    *
    * Determinism: every metric reduces to order-free integer sums —
    * ECE = Σ|sms_b − np_b·10⁶| / (N·10⁶) (the n_b factors cancel
    * exactly), MCE is a max of per-bin rationals, Brier =
    * Σ(sm − y·10⁶)² / (N·10¹²) with the squares in longs (≤10¹² per
    * row — no overflow below ~9·10⁶ rows per partition sum at sf0.1's
    * scale, and Spark sums longs exactly) — one division each at the
    * end. Scale shape: per variant one zero-shuffle projection + one
    * 10-row hash-agg + one scalar agg. Golden-oracled (Platt IRLS +
    * PAV are driver fits). */
  private def q490(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val z = QualityClassifier.logitExpr(
      QualityClassifier.defaultModel(col("text")))
    val raw = round(QualityClassifier.scoreExpr(
      QualityClassifier.defaultModel(col("text"))), 6)
    val calBucket = pmod(conv(substring(md5(concat(lit("cal:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(5))
    val ab = QualityClassifier.fitCalibration(
      d.filter(calBucket === 0), "doc_id", ruleLabel.cast("double"), z,
      iters = 8, sampleSize = 2000)
    val steps = QualityClassifier.fitIsotonicDeciles(d, ruleLabel, raw)

    def scorecard(variant: String, score: Column): DataFrame = {
      val perBin = d
        .select(score.as("s"), ruleLabel.as("y"))
        .select(least(floor(col("s") * 10), lit(9.0)).cast("int").as("bin"),
          floor(col("s") * 1e6 + 0.5).cast("long").as("sm"), col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("sm").as("sms"), sum("y").as("np"),
          sum((col("sm") - col("y") * 1e6.toLong) *
            (col("sm") - col("y") * 1e6.toLong)).as("sq"))
      perBin.agg(
          sum("n").as("nt"),
          sum(abs(col("sms") - col("np") * 1e6.toLong)).as("gapsum"),
          max(abs(col("sms") - col("np") * 1e6.toLong).cast("double")
            / (col("n") * 1e6)).as("mce"),
          sum("sq").as("sqsum"))
        .select(lit(variant).as("variant"),
          col("nt").cast("long").as("n_docs"),
          round(col("gapsum").cast("double") / (col("nt") * 1e6), 6)
            .as("ece"),
          round(col("mce"), 6).as("mce"),
          round(col("sqsum").cast("double") / (col("nt") * 1e12), 6)
            .as("brier"))
    }

    scorecard("isotonic",
        round(QualityClassifier.isotonicScoreExpr(raw, steps), 6))
      .unionAll(scorecard("platt",
        round(QualityClassifier.calibratedScoreExpr(z, ab), 6)))
      .unionAll(scorecard("raw", raw))
      .orderBy("variant")
  }

  private val q490Sql = GoldenOracle.sql("q490_calibration_scorecard",
    "variant, n_docs, ece, mce, brier", "variant")

  // --------------------------------------------------------------- q491
  /** PRECISION-TARGETED THRESHOLD TRANSFER — the operational question
    * q424/q426/q485 keep circling: an operator does not pick a score
    * THRESHOLD, they pick a target PRECISION and need the threshold
    * that delivers it. Per target precision (80/90/95/99%): the LOWEST
    * raw-score threshold t whose admitted set {s ≥ t} meets the
    * target (lowest = maximal yield under the constraint), with the
    * achieved precision, kept/positive counts, and yield fraction; an
    * unachievable target emits an explicit NULL row. On THIS model the
    * table also exposes the raw score's top-bin pathology q484 found —
    * the highest-scored docs are mostly rule-negative, so cumulative
    * precision first has to climb OUT of the top bin — exactly why the
    * q486/q489 recalibrators exist.
    *
    * Determinism: thresholds are the 6-dp score values present in the
    * data; cumulative counts are exact long sums over the
    * DISTINCT-SCORE relation; the precision test is the integer
    * cross-multiplication cp·100 ≥ pct·cn (no float compare anywhere);
    * achieved ratios are one rounded division each. Scale shape: one
    * zero-shuffle projection → one hash-agg to the distinct-score
    * grain → cumulative window over THAT bounded relation (≤10⁶ rows
    * by construction of 6-dp scores, thousands in practice — never the
    * corpus) → a 4-row spine join. Fully SQL-replayed (literal
    * weights; no fit dependence). */
  private def q491(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val d = Tables(s, dir)("documents")
    val raw = round(QualityClassifier.scoreExpr(
      QualityClassifier.defaultModel(col("text"))), 6)
    val grouped = d.select(raw.as("s"), ruleLabel.as("y"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("p"))
    // cumulative-from-top over the distinct-score relation (bounded —
    // the single-partition window never sees the corpus grain)
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grouped.select(col("s"),
        sum("n").over(w).as("cn"), sum("p").over(w).as("cp"))
      .localCheckpoint() // read by all four targets
    val total = d.count()
    val targets = Seq(80, 90, 95, 99).toDF("target_pct")
    val qualifying = targets.join(cum,
        col("cp") * 100 >= col("target_pct") * col("cn"), "left")
      .groupBy("target_pct")
      .agg(min_by(struct(col("s"), col("cn"), col("cp")), col("s"))
        .as("best"))
    qualifying.select(col("target_pct"),
        col("best.s").as("threshold"),
        col("best.cn").cast("long").as("n_kept"),
        col("best.cp").cast("long").as("n_pos"),
        round(col("best.cp").cast("double") / col("best.cn"), 6)
          .as("precision"),
        round(col("best.cn").cast("double") / total, 6).as("yield_frac"))
      .orderBy("target_pct")
  }

  private val q491Sql: String =
    s"""WITH f AS (
         ${OracleLogit.featuresSql("doc_id, n_chars AS raw_chars")}),
       z AS (
         SELECT doc_id, raw_chars, n_tok,
           ${OracleLogit.zExprSql} AS z
         FROM f),
       sc AS (
         SELECT round(1.0 / (1.0 + exp(-z)), 6) AS s,
           CASE WHEN raw_chars >= 64 AND raw_chars <= 4096
                     AND n_tok >= 8 THEN 1 ELSE 0 END AS y
         FROM z),
       g AS (SELECT s, count(*) AS n, sum(y) AS p FROM sc GROUP BY 1),
       cum AS MATERIALIZED (
         SELECT s,
           sum(n) OVER (ORDER BY s DESC
             ROWS UNBOUNDED PRECEDING) AS cn,
           sum(p) OVER (ORDER BY s DESC
             ROWS UNBOUNDED PRECEDING) AS cp
         FROM g),
       tot AS (SELECT count(*) AS nt FROM sc),
       t AS (SELECT t.tp AS target_pct
             FROM unnest([80, 90, 95, 99]) AS t(tp)),
       best AS (
         SELECT target_pct, min(s) AS threshold
         FROM t JOIN cum ON cp * 100 >= target_pct * cn
         GROUP BY 1)
       SELECT t.target_pct AS target_pct, b.threshold AS threshold,
         CAST(c.cn AS BIGINT) AS n_kept, CAST(c.cp AS BIGINT) AS n_pos,
         round(CAST(c.cp AS DOUBLE) / c.cn, 6) AS precision,
         round(CAST(c.cn AS DOUBLE) / nt, 6) AS yield_frac
       FROM t LEFT JOIN best b USING (target_pct)
              LEFT JOIN cum c ON c.s = b.threshold
              CROSS JOIN tot
       ORDER BY target_pct"""

  override val queries: Map[String, QueryFn] = Map(
    "q486_score_recalibration" -> q486 _,
    "q487_artifact_drift" -> q487 _,
    "q488_ivfpq_tuning" -> q488 _,
    "q489_isotonic_recalibration" -> q489 _,
    "q490_calibration_scorecard" -> q490 _,
    "q491_threshold_transfer" -> q491 _)

  override val oracles: Map[String, String] = Map(
    "q486_score_recalibration" -> q486Sql,
    "q487_artifact_drift" -> q487Sql,
    "q488_ivfpq_tuning" -> q488Sql,
    "q489_isotonic_recalibration" -> q489Sql,
    "q490_calibration_scorecard" -> q490Sql,
    "q491_threshold_transfer" -> q491Sql)
}
