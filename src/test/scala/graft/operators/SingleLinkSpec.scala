package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

class SingleLinkSpec extends GraftTestBase {

  test("chain of near points merges at the right cut (single-link chaining)") {
    import spark.implicits._
    // A-B-C spaced 0.009 apart: singletons at 0.005, ONE cluster at
    // 0.01 even though A-C are 0.018 apart — the chaining behavior
    // that defines single-link (and that DBSCAN's density test would
    // veto at minPts > 2); D sits far away and never joins
    val pts = Seq(
      (1L, 0.000, 0.0), (2L, 0.009, 0.0), (3L, 0.018, 0.0),
      (9L, 5.000, 5.0)).toDF("id", "x", "y")
    val cuts = SingleLink.cuts(pts, "id", "x", "y", Seq(0.005, 0.01))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(Set(1L, 2L, 3L, 9L).map(cuts(_)._1).size == 4, "fine cut merged")
    assert(cuts(1L)._2 == cuts(2L)._2 && cuts(2L)._2 == cuts(3L)._2,
      s"chain not merged at 0.01: $cuts")
    assert(cuts(9L)._2 != cuts(1L)._2, "far point absorbed")
  }

  test("cuts nest: a fine cluster never straddles two coarse ones") {
    val p = Tables(spark, sf001)("embeddings").select(col("vec_id"),
      element_at(col("embedding"), 1).as("x"),
      element_at(col("embedding"), 2).as("y"))
    val cuts = SingleLink.cuts(p, "vec_id", "x", "y",
      Seq(0.005, 0.01, 0.02)).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // refinement: same cut0 => same cut1; same cut1 => same cut2
    assert(cuts.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1))
    assert(cuts.groupBy(_._2).values.forall(_.map(_._3).distinct.size == 1))
    // and the ladder actually coarsens
    val n = Seq(cuts.map(_._1).distinct.size, cuts.map(_._2).distinct.size,
      cuts.map(_._3).distinct.size)
    assert(n(0) >= n(1) && n(1) >= n(2), s"cluster counts $n")
    assert(n(2) < n(0), s"no merging happened across the ladder: $n")
  }
}
