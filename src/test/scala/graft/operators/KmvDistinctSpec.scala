package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** KMV estimator contract: exactness below k, ~1/√k accuracy above it,
  * and merge-order determinism. */
class KmvDistinctSpec extends GraftTestBase {
  import spark.implicits._

  test("groups with fewer than k distinct values are exact") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 7))
      .toDF("g", "v")
    val out = KmvDistinct.estimate(df, "g", col("v"), k = 16, salt = "s")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out == Map("a" -> 2.0, "b" -> 1.0))
  }

  test("estimate tracks a large true cardinality within ~3/sqrt(k)") {
    val k = 64
    val n = 5000
    val df = (1 to n).map(i => ("g", i)).toDF("g", "v")
    val est = KmvDistinct.estimate(df, "g", col("v"), k, salt = "s")
      .collect().head.getDouble(2)
    assert(math.abs(est - n) / n <= 3.0 / math.sqrt(k),
      s"est=$est for true $n")
  }

  test("estimate is invariant to partitioning") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", i * 7)).toDF("g", "v")
    def run(parts: Int) = KmvDistinct
      .estimate(df.repartition(parts), "g", col("v"), k = 32, salt = "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(run(2) == run(13))
  }

  test("overlapEstimate is exact below k and symmetric in the pair") {
    // X = {1,2,3,4}, Y = {3,4,5,6}: union 6, intersection 2
    val df = (Seq(1, 2, 3, 4).map(("x", _)) ++ Seq(3, 4, 5, 6).map(("y", _)))
      .toDF("g", "v")
    val out = KmvDistinct.overlapEstimate(df, "g", col("v"), k = 16, salt = "s")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "x" && r.getString(1) == "y")
    assert(r.getAs[Long]("n_union_kept") == 6L)
    assert(r.getAs[Long]("n_common") == 2L)
    assert(r.getAs[Double]("est_union") == 6.0)
    assert(math.abs(r.getAs[Double]("est_jaccard") - 2.0 / 6) < 1e-6)
    assert(r.getAs[Double]("est_intersection") == 2.0)
  }

  test("overlapEstimate above k: sane estimates for a planted 50% overlap") {
    val k = 64
    // A = 1..2000, B = 1001..3000: union 3000, inter 1000, J = 1/3
    val df = ((1 to 2000).map(("a", _)) ++ (1001 to 3000).map(("b", _)))
      .toDF("g", "v")
    val r = KmvDistinct.overlapEstimate(df, "g", col("v"), k, salt = "s")
      .collect().head
    val eu = r.getAs[Double]("est_union")
    val jac = r.getAs[Double]("est_jaccard")
    assert(math.abs(eu - 3000) / 3000 <= 3.0 / math.sqrt(k), s"union est $eu")
    assert(jac > 0.1 && jac < 0.6, s"jaccard est $jac for true 0.333")
    // intersection estimate is exactly jac * union by construction
    assert(math.abs(r.getAs[Double]("est_intersection") - jac * eu) <= 5e-4)
  }

  test("overlapEstimate covers every unordered pair once") {
    val df = (1 to 300).map(i => (s"g${i % 4}", i)).toDF("g", "v")
    val pairs = KmvDistinct.overlapEstimate(df, "g", col("v"), k = 8, salt = "s")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.length == 6 && pairs.distinct.length == 6)
    pairs.foreach { case (a, b) => assert(a < b) }
  }
}
