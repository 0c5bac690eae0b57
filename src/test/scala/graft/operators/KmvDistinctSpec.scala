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
}
