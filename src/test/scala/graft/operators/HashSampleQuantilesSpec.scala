package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** Pins the determinism and error contract of the bottom-k hash-sample
  * quantile sketch — the order-independent alternative to GK that the
  * q351 oracle depends on. */
class HashSampleQuantilesSpec extends GraftTestBase {
  import spark.implicits._

  private val K = 256

  private def li = Tables(spark, sf001)("lineitem")
  private def key = concat_ws("-", col("l_orderkey"), col("l_linenumber"))

  test("bottom-k sample is invariant to partitioning (mergeable sketch law)") {
    def sampleOf(parts: Int) =
      HashSampleQuantiles
        .bottomKSample(li.repartition(parts), col("l_extendedprice"), key, K)
        .collect().map(_.getDouble(0)).sorted.toSeq
    val a = sampleOf(3)
    val b = sampleOf(11)
    assert(a.length == K)
    assert(a == b)
  }

  test("estimates stay inside the DKW-style rank-error band") {
    val qs = Seq(0.1, 0.5, 0.9)
    val sample = HashSampleQuantiles
      .bottomKSample(li, col("l_extendedprice"), key, K)
    val est = HashSampleQuantiles.sampleQuantiles(sample, K, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val vals = li.select(col("l_extendedprice")).collect()
      .map(_.getDouble(0)).sorted
    val n = vals.length.toDouble
    // 3-sigma binomial band at k=256: ~0.094 for the median
    qs.foreach { q =>
      val rankFrac = vals.count(_ <= est(q)) / n
      assert(math.abs(rankFrac - q) <= 3 * math.sqrt(q * (1 - q) / K) + 1.0 / K,
        s"q=$q est=${est(q)} rankFrac=$rankFrac")
    }
  }

  test("corpus smaller than k rescales ranks instead of dropping quantiles") {
    val tiny = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "x")
    val sample = HashSampleQuantiles
      .bottomKSample(tiny, col("x"), col("id").cast("string"), K)
    val est = HashSampleQuantiles.sampleQuantiles(sample, K, Seq(0.5, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // k_eff = 3: median hits rank ceil(1.5)=2, p99 rank ceil(2.97)=3
    assert(est == Map(0.5 -> 20.0, 0.99 -> 30.0))
  }

  test("duplicate sample keys cannot make the cut ambiguous (h,v total order)") {
    // two rows with the SAME key and different values: the (h, v)
    // tiebreak must admit the smaller value when the cut lands between
    // them, regardless of partitioning.
    val df = (1 to 50).map(i => (s"k$i", i.toDouble))
      .toDF("k", "x")
      .union(Seq(("k1", 999.0)).toDF("k", "x"))
    def s(parts: Int) = HashSampleQuantiles
      .bottomKSample(df.repartition(parts), col("x"), col("k"), 10)
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(s(2) == s(7))
  }
}
