package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based quality filtering — the classifier stage of production
  * curation (the fastText wiki-vs-crawl pattern): a trained linear
  * model scores every document and a threshold gates it, replacing
  * hand-tuned rule stacks with one learned surface.
  *
  * Spark shape: the model is DRIVER-SIDE state measured in bytes
  * (bias + one weight per feature), inlined as literals into a single
  * row-local projection — featurize → dot → sigmoid runs inside
  * whole-stage codegen with zero shuffles, zero joins, zero UDFs, at
  * any corpus size. (A real deployment swaps the literal weights for
  * ones fit offline; the plan shape does not change.)
  *
  * Determinism: every feature is an exact integer ratio of counts the
  * SQL oracle recomputes bit-for-bit; the score applies one exp() per
  * row on an identical double, so round(6) output is engine-stable
  * (the q376 ln/exp precedent).
  */
object QualityClassifier {

  /** Hard ceiling on the test-only `sampleSize <= 0` fit path — the
    * bounded-driver-state contract made explicit (a corpus-sized
    * collect should fail loudly, not OOM the driver). */
  val MaxLocalFitRows = 100000

  /** (feature expression, weight) pairs + bias. */
  final case class Model(bias: Double, terms: Seq[(Column, Double)])

  /** The library's feature set over a text column, NAMED so fitted
    * weights can persist/load positionally ([[ModelStore.saveLogistic]])
    * — exact count ratios, shared with the q22 rule-based profile. */
  def defaultFeatures(text: Column): Seq[(String, Column)] = {
    val toks = TextFunctions.tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    Seq(
      // longer docs are likelier to be prose, saturating via ratio
      "len_sat" -> nTok / (nTok + lit(50.0)),
      // stopword density: the strongest natural-language signal
      "stopword_ratio" -> (TextFunctions.stopwordCount(toks,
        Seq("the", "a", "of", "to", "and")).cast("double") /
        greatest(nTok, lit(1.0))),
      // punctuation share: prose has some, boilerplate/code has lots
      "punct_share" -> (TextFunctions.punctCount(text).cast("double") /
        greatest(nChars, lit(1.0))),
      // lexical diversity: near-zero for template/repetition spam
      "ttr" -> (size(array_distinct(toks)).cast("double") /
        greatest(nTok, lit(1.0))))
  }

  /** Reference literal weights for [[defaultFeatures]] (hand-set; a
    * deployment replaces them with a [[fit]] result via
    * [[fittedModel]] — the plan shape is identical either way). */
  val DefaultWeights: Seq[Double] = Seq(-1.2, 2.4, 6.0, -8.0, 1.5)

  def defaultModel(text: Column): Model =
    fromWeights(defaultFeatures(text), DefaultWeights)

  /** Assemble a Model from a feature list plus a (bias +: weights)
    * vector — the [[fit]]/[[ModelStore.loadLogistic]] output shape. */
  def fromWeights(features: Seq[(String, Column)],
                  weights: Seq[Double]): Model = {
    require(weights.length == features.length + 1,
      s"${weights.length} weights for ${features.length} features (+bias)")
    Model(weights.head, features.map(_._2).zip(weights.tail))
  }

  /** [[fromWeights]] over the default feature set — the serve side of
    * the persisted-classifier contract. */
  def fittedModel(text: Column, weights: Seq[Double]): Model =
    fromWeights(defaultFeatures(text), weights)

  /** The pre-sigmoid logit z = bias + Σ wᵢ·fᵢ, summed in term order —
    * pure rational arithmetic on exact count ratios, so it is
    * bit-identical across engines (unlike the sigmoid, whose exp()
    * differs in the last ulp). Rank/bucket logic should order on THIS,
    * not on the score (same ordering, no float hazard). */
  def logitExpr(model: Model): Column =
    model.terms.foldLeft(lit(model.bias): Column) {
      case (acc, (f, w)) => acc + f * lit(w)
    }

  /** score = sigmoid(bias + Σ wᵢ·fᵢ), summed in term order. */
  def scoreExpr(model: Model): Column =
    lit(1.0) / (lit(1.0) + exp(-logitExpr(model)))

  /** Score + gate every document: (idCol…, quality_score, kept). */
  def filter(docs: DataFrame, textCol: String,
             threshold: Double = 0.5,
             model: Column => Model = defaultModel): DataFrame = {
    val score = scoreExpr(model(col(textCol)))
    docs.withColumn("quality_score", score)
      .withColumn("kept", (col("quality_score") >= threshold).cast("int"))
  }

  /** PLATT SCALING (Platt 1999; the post-hoc recalibration Guo et al.
    * 2017 benchmark as the strong baseline): fit sigmoid(a + b·z) to
    * the label on a held-out calibration set, where z is the existing
    * classifier's RAW logit — i.e. logistic regression with the logit
    * as the only feature, riding [[fit]]'s bounded-sample IRLS
    * unchanged at d=1. Temperature scaling is the b-only special case;
    * the (a, b) form also repairs a biased intercept, which a hand-set
    * weight stack (DefaultWeights) typically has. Returns Seq(a, b)
    * (6-dp) — persist via [[ModelStore.saveLogistic]] with feature
    * list `Seq("logit")`, serve via [[calibratedScoreExpr]]. */
  def fitCalibration(docs: DataFrame, idCol: String, labelExpr: Column,
                     rawLogit: Column, iters: Int = 8,
                     sampleSize: Int = 2000): Seq[Double] =
    fit(docs, idCol, labelExpr, Seq("logit" -> rawLogit), iters, sampleSize)

  /** The recalibrated score sigmoid(a + b·z) for `ab` = Seq(a, b) —
    * one extra fused-multiply-add per row over the raw score's cost;
    * stays inside whole-stage codegen. */
  def calibratedScoreExpr(rawLogit: Column, ab: Seq[Double]): Column = {
    require(ab.length == 2, s"calibration wants (a, b), got ${ab.length}")
    lit(1.0) / (lit(1.0) + exp(-(lit(ab.head) + lit(ab(1)) * rawLogit)))
  }

  /** HISTOGRAM-ISOTONIC CALIBRATION (Zadrozny & Elkan 2002 histogram
    * binning repaired by the pool-adjacent-violators algorithm — the
    * non-parametric rung of Guo et al. 2017's calibration ladder,
    * for when the miscalibration is not sigmoid-shaped): per raw-score
    * decile, the observed positive rate, PAV-pooled into a
    * NON-DECREASING step function of 10 values.
    *
    * Unlike the IRLS fits this needs no sample: the sufficient
    * statistic is one 10-row hash-agg over the full corpus (exact
    * integer (n, positives) per decile — bounded driver state at any
    * scale), and PAV runs on ≤10 blocks driver-side with violation
    * tests on cross-multiplied longs (no float comparisons anywhere).
    * Empty deciles inherit their covering block's value (preceding
    * block, or the first block when leading), so the serve function is
    * total. Values are 6-dp rounded.
    *
    * Returns the 10 step values for [[isotonicScoreExpr]] /
    * [[ModelStore.saveIsotonic]]. */
  def fitIsotonicDeciles(docs: DataFrame, labelExpr: Column,
                         rawScore: Column): Seq[Double] = {
    val binned = docs
      .select(least(floor(rawScore * 10), lit(9.0)).cast("int").as("bin"),
        labelExpr.cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(binned.nonEmpty, "empty isotonic fit input")
    // stack-based PAV over the non-empty bins, ascending
    final case class Block(pos: Long, n: Long, upTo: Int)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    (0 until 10).foreach { b =>
      binned.get(b).foreach { case (n, pos) =>
        stack += Block(pos, n, b)
        // pool while the previous block's rate >= this block's rate
        // (exact: cross-multiplied longs; >= also pools ties)
        while (stack.length >= 2 &&
          stack(stack.length - 2).pos * stack.last.n >=
            stack.last.pos * stack(stack.length - 2).n) {
          val top = stack.remove(stack.length - 1)
          val prev = stack.remove(stack.length - 1)
          stack += Block(prev.pos + top.pos, prev.n + top.n, top.upTo)
        }
      }
    }
    val values = stack.map(bl => BigDecimal(bl.pos.toDouble / bl.n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // expand blocks back to the 10 deciles; leading empties take the
    // first block's value, others the last block ending at-or-before
    (0 until 10).map { b =>
      val i = stack.indexWhere(_.upTo >= b)
      values(if (i < 0) stack.length - 1 else i)
    }
  }

  /** The isotonic-calibrated score: the step value of the raw score's
    * decile — one floor + one literal-array lookup per row, inside
    * whole-stage codegen. */
  def isotonicScoreExpr(rawScore: Column, steps: Seq[Double]): Column = {
    require(steps.length == 10, s"want 10 step values, got ${steps.length}")
    element_at(typedLit(steps),
      least(floor(rawScore * 10), lit(9.0)).cast("int") + 1)
  }

  /** Fit the classifier's weights IN-ENGINE — fixed-round IRLS
    * (Newton-Raphson on the logistic log-likelihood: each round solves
    * (Xᵀ S X + λI) δ = Xᵀ(y − p)) over a BOUNDED deterministic sample,
    * the same driver-fit class as [[KMeans.fitLocal]] / [[IvfPq.fit]]:
    * at 100 TB a fastText-style quality filter is trained on O(10³-10⁴)
    * labeled rows and served everywhere, so the cluster does ONE
    * bounded top-S job (smallest md5(id) — reproducible under retries,
    * scale-independent) and the tiny (d+1)² normal-equation solve runs
    * driver-local in fixed ascending-id accumulation order.
    *
    * Determinism: fixed row order, [[StrictMath.exp]] (bit-specified,
    * unlike Math.exp's 1-ulp license), fixed-pivot Gaussian
    * elimination, fixed round count, and the returned weights rounded
    * to 6 dp — so every downstream score/logit literal is
    * bit-deterministic, which is what lets the q478 golden snapshot
    * pin the fit across engines and configs.
    *
    * `labelExpr` must evaluate to 0.0/1.0 doubles. Returns
    * (bias +: weights) aligned with `features` — feed to
    * [[fromWeights]] / [[ModelStore.saveLogistic]].
    * `sampleSize <= 0` fits on every row — TEST-ONLY scope: the
    * collect is still driver-local, so the path hard-fails past
    * [[MaxLocalFitRows]] rows rather than silently pulling a corpus
    * to the driver (the engine's bounded-driver-state contract). */
  def fit(docs: DataFrame, idCol: String, labelExpr: Column,
          features: Seq[(String, Column)],
          iters: Int = 4, sampleSize: Int = 2000,
          ridge: Double = 1e-6): Seq[Double] = {
    require(iters > 0, "iters must be positive")
    val base = docs.select(col(idCol).cast("long").as("__id"),
      array(features.map(_._2.cast("double")): _*).as("__x"),
      labelExpr.cast("double").as("__y"))
    val sampled =
      if (sampleSize <= 0) base.limit(MaxLocalFitRows + 1)
      else base.withColumn("__h", md5(col("__id").cast("string")))
        .orderBy(col("__h"), col("__id")).limit(sampleSize)
        .select("__id", "__x", "__y")
    val collected = sampled.collect()
    require(collected.length <= MaxLocalFitRows,
      s"fit with sampleSize <= 0 is test-only and capped at " +
        s"$MaxLocalFitRows rows; pass a positive sampleSize for the " +
        s"bounded top-S sample")
    val rows = collected
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1) // fixed accumulation order (KMeans.fitLocal discipline)
    require(rows.nonEmpty, "empty fit sample")
    fitLocal(rows.map { case (_, x, y) => (x, y) }.toIndexedSeq, iters, ridge)
  }

  /** The driver-local IRLS core behind [[fit]], exposed so the spec can
    * pin it to the closed-form MLE on a toy. `rows` must already be in
    * the caller's fixed order. Returns (bias +: weights), 6-dp. */
  def fitLocal(rows: IndexedSeq[(Array[Double], Double)], iters: Int,
               ridge: Double = 1e-6): Seq[Double] = {
    val d = rows.head._1.length + 1 // bias + features
    val w = new Array[Double](d)    // start at 0: p = 0.5 everywhere
    (1 to iters).foreach { _ =>
      val a = Array.fill(d)(new Array[Double](d))
      val b = new Array[Double](d)
      rows.foreach { case (x, y) =>
        var z = w(0)
        var j = 0
        while (j < x.length) { z += w(j + 1) * x(j); j += 1 }
        // clamped sigmoid: on separable data late rounds push |z| far
        // out; the clamp keeps S invertible (with the ridge) without
        // changing converged small-|z| arithmetic
        val p0 = 1.0 / (1.0 + StrictMath.exp(-z))
        val p = math.min(1.0 - 1e-12, math.max(1e-12, p0))
        val s = p * (1.0 - p)
        val r = y - p
        var i = 0
        while (i < d) {
          val xi = if (i == 0) 1.0 else x(i - 1)
          b(i) += xi * r
          var k = i
          while (k < d) {
            val xk = if (k == 0) 1.0 else x(k - 1)
            a(i)(k) += s * xi * xk
            k += 1
          }
          i += 1
        }
      }
      var i = 0
      while (i < d) { // mirror the upper triangle + ridge
        a(i)(i) += ridge
        var k = i + 1
        while (k < d) { a(k)(i) = a(i)(k); k += 1 }
        i += 1
      }
      val delta = solveFixed(a, b)
      i = 0
      while (i < d) { w(i) += delta(i); i += 1 }
    }
    w.map(x => BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq
  }

  /** Gaussian elimination with FIXED pivot order (no row swaps — the
    * ridge keeps the IRLS normal matrix strictly positive definite, so
    * every natural pivot is nonzero) — a deterministic expression tree,
    * bit-stable across JVMs. Mutates its arguments. */
  private def solveFixed(a: Array[Array[Double]],
                         b: Array[Double]): Array[Double] = {
    val d = b.length
    var i = 0
    while (i < d) {
      val piv = a(i)(i)
      var r = i + 1
      while (r < d) {
        val f = a(r)(i) / piv
        var c = i
        while (c < d) { a(r)(c) -= f * a(i)(c); c += 1 }
        b(r) -= f * b(i)
        r += 1
      }
      i += 1
    }
    val x = new Array[Double](d)
    i = d - 1
    while (i >= 0) {
      var s = b(i)
      var c = i + 1
      while (c < d) { s -= a(i)(c) * x(c); c += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }
}
