package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

class KMeansSpec extends GraftTestBase {

  private lazy val emb = Tables(spark, sf001)("embeddings")

  test("inertia is non-increasing across Lloyd iterations") {
    val (_, inertia) = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 5)
    assert(inertia.length == 5)
    inertia.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-9), s"inertia rose: $a -> $b")
    }
    assert(inertia.last < inertia.head, "no improvement at all in 5 iters")
  }

  test("fit is deterministic and keeps k centroids of the input dim") {
    val (c1, i1) = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val (c2, i2) = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(i1 == i2)
    assert(c1.count() == 8 && c2.count() == 8)
    assert(c1.exceptAll(c2).isEmpty && c2.exceptAll(c1).isEmpty)
    assert(c1.select(size(col("centroid"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(64))
  }

  test("fitLocal is input-order invariant and tracks the distributed fit") {
    val rows = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toIndexedSeq
    val a = KMeans.fitLocal(rows, k = 8, iters = 3)
    val b = KMeans.fitLocal(scala.util.Random.shuffle(rows.toVector).toIndexedSeq,
      k = 8, iters = 3)
    // bit-identical under ANY input order (fitLocal sorts internally)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == 8 && a.forall(_.length == 64))
    // same seed rule as the distributed fit -> centroids agree to
    // float summation order (distributed means sum partition-wise)
    val (cdf, _) = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val dist = cdf.orderBy("centroid_id").collect()
      .map(_.getSeq[Double](1).toArray)
    a.zip(dist).foreach { case (la, da) =>
      la.zip(da).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, "local vs distributed centroid drift")
      }
    }
  }

  test("trained centroids drive ivfTopK: nprobe=k recovers exact top-k") {
    val (cents, _) = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 3,
      centroids = cents.withColumnRenamed("centroid", "embedding"),
      centroidIdCol = "centroid_id", nprobe = 8)
    assert(exact.exceptAll(ivf).isEmpty && ivf.exceptAll(exact).isEmpty,
      "IVF with all buckets probed must equal brute force")
  }
}
