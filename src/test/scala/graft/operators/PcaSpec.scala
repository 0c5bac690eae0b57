package graft.operators

import graft.GraftTestBase

class PcaSpec extends GraftTestBase {
  import spark.implicits._

  test("planted dominant axis: power iteration recovers the known eigenvector") {
    // points = t * (3,4)/5 + tiny off-axis jitter: the top principal
    // direction is (0.6, 0.8) with nearly all variance on it
    val pts = (0 until 40).map { i =>
      val t = (i - 20).toDouble
      val j = if (i % 2 == 0) 0.01 else -0.01
      (i.toLong, Seq((0.6 * t - 0.8 * j).toFloat, (0.8 * t + 0.6 * j).toFloat))
    }
    val df = pts.toDF("id", "vec")
    val cov = Pca.covariance(df, "id", "vec", dim = 2)
    val out = Pca.powerIteration(cov, dim = 2, iters = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (l0, lam, ve) = out(0L)
    val (l1, _, _) = out(1L)
    assert(math.abs(l0 - 0.6) < 1e-3 && math.abs(l1 - 0.8) < 1e-3)
    assert(ve > 0.999) // off-axis jitter carries ~1e-6 of the variance
    // eigenvalue = variance along the axis: Var(t) over -20..19
    val ts = (0 until 40).map(i => (i - 20).toDouble)
    val mean = ts.sum / 40
    val expected = ts.map(t => (t - mean) * (t - mean)).sum / 40
    assert(math.abs(lam - expected) < 0.01)
  }

  test("fit + reconstruction residual flags the planted off-axis outlier") {
    // 30 on-axis points along (1,0) + one point orthogonal to the
    // dominant direction: its residual must top every on-axis point's
    val pts = (0 until 30).map(i => (i.toLong, Seq((i - 15).toFloat, 0.0f))) :+
      (30L, Seq(0.0f, 5.0f))
    val df = pts.toDF("id", "vec")
    val m = Pca.fit(df, "id", "vec", dim = 2, iters = 16)
    assert(math.abs(math.abs(m.loadings(0)) - 1.0) < 1e-2)
    def resid(p: Seq[Float]): Double = {
      val c = p.indices.map(i => p(i) - m.means(i))
      val proj = c.indices.map(i => m.loadings(i) * c(i)).sum
      c.map(x => x * x).sum - proj * proj
    }
    val outlier = resid(pts.last._2)
    assert(pts.init.map(p => resid(p._2)).max < outlier)
  }

  test("fitTopK: deflation recovers two known orthogonal axes in order") {
    // independent spreads on axes 0 (var 16x) and 2 (var 1x) of a 4-d
    // space: pc1 = e0, pc2 = e2, and both eigenvalues are the axis
    // variances
    val pts = (0 until 32).map { i =>
      (i.toLong, Seq((4.0 * ((i % 8) - 3.5)).toFloat, 0.0f,
        ((i / 8) - 1.5).toFloat, 0.0f))
    }
    val model = Pca.fitTopK(pts.toDF("id", "vec"), "id", "vec",
      dim = 4, k = 2, iters = 24)
    val Seq((v1, lam1), (v2, lam2)) = model.components.toSeq
    val trace = model.trace
    assert(math.abs(v1(0) - 1.0) < 1e-6 && math.abs(v2(2)) > 1 - 1e-6)
    val varAxis0 = 16.0 * (0 until 8).map(i => math.pow(i - 3.5, 2)).sum / 8
    val varAxis2 = (0 until 4).map(i => math.pow(i - 1.5, 2)).sum / 4
    assert(math.abs(lam1 - varAxis0) < 1e-3)
    assert(math.abs(lam2 - varAxis2) < 1e-3)
    assert(math.abs(trace - (varAxis0 + varAxis2)) < 1e-3)
    val dot = v1.indices.map(i => v1(i) * v2(i)).sum
    assert(math.abs(dot) < 1e-6)
  }

  test("covariance is symmetric with unit-consistent diagonal") {
    val pts = (0 until 30).map { i =>
      (i.toLong, Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat))
    }
    val cov = Pca.covariance(pts.toDF("id", "vec"), "id", "vec", dim = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cov.size == 9)
    for (i <- 0 until 3; j <- 0 until 3) assert(cov((i, j)) == cov((j, i)))
    for (i <- 0 until 3) assert(cov((i, i)) >= 0.0)
  }
}
