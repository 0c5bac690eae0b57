package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Pins [[QualityClassifier.fit]]'s IRLS to ground truth:
  *   - on a 1-D binary-feature toy the logistic MLE has a CLOSED FORM
  *     (bias = logit(P(y|x=0)), weight = logit(P(y|x=1)) − bias) and
  *     converged IRLS must land on it;
  *   - on a separable toy the fixed-round fit must reach a perfectly
  *     separating boundary (weights keep growing round-over-round by
  *     MLE divergence — the FIXED round count is what bounds them);
  *   - the DataFrame path must equal the driver core on the same rows
  *     (the sample/collect plumbing adds nothing);
  *   - the whole fit is bit-deterministic (StrictMath + fixed orders).
  */
class LogisticFitSpec extends GraftTestBase {

  // x=0: 70 rows, 21 positive (p=0.3); x=1: 50 rows, 40 positive (p=0.8)
  private def binaryToy: IndexedSeq[(Array[Double], Double)] =
    (IndexedSeq.fill(21)((Array(0.0), 1.0)) ++
      IndexedSeq.fill(49)((Array(0.0), 0.0)) ++
      IndexedSeq.fill(40)((Array(1.0), 1.0)) ++
      IndexedSeq.fill(10)((Array(1.0), 0.0)))

  test("IRLS converges to the closed-form MLE on the binary-feature toy") {
    val w = QualityClassifier.fitLocal(binaryToy, iters = 25)
    val bias = math.log(0.3 / 0.7)            // logit(p(y=1|x=0))
    val slope = math.log(0.8 / 0.2) - bias    // logit(p(y=1|x=1)) − bias
    assert(math.abs(w(0) - bias) < 1e-4, s"bias ${w(0)} vs $bias")
    assert(math.abs(w(1) - slope) < 1e-4, s"slope ${w(1)} vs $slope")
  }

  test("fixed-round fit separates a separable toy perfectly") {
    val rows = (0 until 40).map { i =>
      val x = if (i % 2 == 0) 0.0 else 1.0
      (Array(x), x) // y = x: perfectly separable
    }.toIndexedSeq
    val w = QualityClassifier.fitLocal(rows, iters = 4)
    assert(w(0) < 0.0, s"logit at x=0 must be negative, got ${w(0)}")
    assert(w(0) + w(1) > 0.0,
      s"logit at x=1 must be positive, got ${w(0) + w(1)}")
    // and more rounds push the boundary harder, never flip it
    val w8 = QualityClassifier.fitLocal(rows, iters = 8)
    assert(w8(1) > w(1))
  }

  test("the DataFrame fit equals the driver core on the same rows") {
    import spark.implicits._
    val df = binaryToy.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x(0), y) }
      .toDF("id", "xv", "y")
    val viaDf = QualityClassifier.fit(df, "id", col("y"),
      Seq("x" -> col("xv")), iters = 6, sampleSize = 0)
    // the core consumes rows in the fit()'s fixed ascending-id order,
    // which here is construction order
    val viaCore = QualityClassifier.fitLocal(binaryToy, iters = 6)
    assert(viaDf == viaCore)
  }

  test("Platt calibration lands on the closed-form MLE on a two-logit toy") {
    import spark.implicits._
    // raw logits z ∈ {−1, +1}: positive rates 0.25 / 0.75. The 1-D
    // logistic MLE has the closed form a+b·z = logit(rate(z)), i.e.
    // a = (logit(p+) + logit(p−))/2 and b = (logit(p+) − logit(p−))/2.
    val rows = (0 until 40).map { i => (i.toLong, -1.0, if (i < 10) 1.0 else 0.0) } ++
      (40 until 80).map { i => (i.toLong, 1.0, if (i < 70) 1.0 else 0.0) }
    val df = rows.toDF("id", "z", "y")
    val ab = QualityClassifier.fitCalibration(df, "id", col("y"), col("z"),
      iters = 25, sampleSize = 0)
    val lp = math.log(0.75 / 0.25)
    val lm = math.log(0.25 / 0.75)
    assert(math.abs(ab(0) - (lp + lm) / 2) < 1e-4, s"a ${ab(0)}")
    assert(math.abs(ab(1) - (lp - lm) / 2) < 1e-4, s"b ${ab(1)}")
  }

  test("calibration shrinks the expected calibration error on a miscalibrated toy") {
    import spark.implicits._
    // four logit levels whose observed rates sit far from sigmoid(z)
    val levels = Seq((0.5, 25, 5), (1.0, 25, 10), (1.5, 25, 15), (2.0, 25, 20))
    val rows = levels.zipWithIndex.flatMap { case ((z, n, pos), li) =>
      (0 until n).map(i => ((li * 100 + i).toLong, z,
        if (i < pos) 1.0 else 0.0))
    }
    val df = rows.toDF("id", "z", "y")
    val ab = QualityClassifier.fitCalibration(df, "id", col("y"), col("z"),
      iters = 25, sampleSize = 0)
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    def ece(score: Double => Double): Double =
      levels.map { case (z, n, pos) =>
        n * math.abs(score(z) - pos.toDouble / n)
      }.sum / levels.map(_._2).sum
    val rawEce = ece(sig)
    val calEce = ece(z => sig(ab(0) + ab(1) * z))
    assert(calEce < rawEce / 2,
      s"calibration must at least halve ECE: raw $rawEce cal $calEce")
    // and the serve expression matches the driver arithmetic at 6 dp
    val served = df.select(
        round(QualityClassifier.calibratedScoreExpr(col("z"), ab), 6)
          .as("s"), col("z"))
      .distinct().collect().map(r => r.getDouble(1) -> r.getDouble(0)).toMap
    levels.foreach { case (z, _, _) =>
      assert(math.abs(served(z) - sig(ab(0) + ab(1) * z)) < 1e-6)
    }
  }

  test("isotonic decile fit pools adjacent violators to the weighted PAV solution") {
    import spark.implicits._
    // deciles with rates [0.1, 0.3, 0.2, 0.6] and weights [10,10,20,10]:
    // bins 1 (3/10) and 2 (4/20) violate monotonicity → pool to 7/30;
    // pooled 0.2333 < 0.3? no: 7/30 ≈ 0.2333 vs bin 0's 0.1 — monotone.
    val rows = Seq((0, 10, 1), (1, 10, 3), (2, 20, 4), (3, 10, 6))
      .flatMap { case (bin, n, pos) =>
        (0 until n).map(i => (bin / 10.0 + 0.05, if (i < pos) 1L else 0L))
      }
    val df = rows.toDF("s", "y")
    val steps = QualityClassifier.fitIsotonicDeciles(df, col("y"), col("s"))
    val pooled = BigDecimal(7.0 / 30)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(steps(0) == 0.1 && steps(1) == pooled && steps(2) == pooled &&
      steps(3) == 0.6, s"steps $steps")
    // empty deciles inherit the covering block's value (trailing = last)
    assert(steps(4) == 0.6 && steps(9) == 0.6, s"steps $steps")
    // the whole function is non-decreasing
    assert(steps == steps.sorted, s"not monotone: $steps")
    // and the serve expression reads the fitted step per decile
    // (keyed by decile — the raw doubles 0.15/0.35 are not exactly
    // representable, so a double-keyed map lookup would miss)
    val served = df.select(floor(col("s") * 10).cast("int").as("b"),
        QualityClassifier.isotonicScoreExpr(col("s"), steps).as("c"))
      .distinct().collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(served(0) == 0.1 && served(1) == pooled &&
      served(2) == pooled && served(3) == 0.6)
  }

  test("the fit is bit-deterministic across repeated runs") {
    val a = QualityClassifier.fitLocal(binaryToy, iters = 4)
    val b = QualityClassifier.fitLocal(binaryToy, iters = 4)
    assert(a == b)
    assert(a.forall(x =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble == x), "weights must be 6-dp rounded")
  }
}
