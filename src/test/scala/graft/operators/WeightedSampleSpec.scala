package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class WeightedSampleSpec extends GraftTestBase {
  import spark.implicits._

  private def docs = Seq(
    ("a", 1L, 10), ("a", 2L, 10), ("a", 3L, 1000), ("a", 4L, 10),
    ("a", 5L, 10), ("a", 6L, 10), ("a", 7L, 10), ("a", 8L, 10),
    ("b", 9L, 50), ("b", 10L, 50))
    .toDF("src", "id", "w")

  test("sample is a subset with exactly min(k, |stratum|) rows each") {
    val out = WeightedSample.sample(docs, Seq("src"), "id", col("w"), 3)
    val bySrc = out.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc == Map("a" -> 3L, "b" -> 2L))
    val ids = out.select("id").as[Long].collect().toSet
    assert(ids.subsetOf((1L to 10L).toSet))
  }

  test("deterministic across runs and row orders") {
    val a = WeightedSample.sample(docs, Seq("src"), "id", col("w"), 3)
      .select("src", "sample_rank", "id").collect().toSet
    val b = WeightedSample.sample(docs.orderBy(col("id").desc),
        Seq("src"), "id", col("w"), 3)
      .select("src", "sample_rank", "id").collect().toSet
    assert(a == b)
  }

  test("weight dominance: the 100x-weight row is always picked") {
    // id=3 carries weight 1000 vs 10 for its peers; its score
    // u^(1/1000) is larger than any peer's u^(1/10) unless the peer
    // draws an astronomically better uniform — with these fixed md5
    // draws it must win a slot.
    val out = WeightedSample.sample(docs, Seq("src"), "id", col("w"), 3)
    assert(out.filter(col("id") === 3).count() == 1)
  }

  test("rank 1 has the highest score within each stratum") {
    val out = WeightedSample.sample(docs, Seq("src"), "id", col("w"), 3)
      .select("src", "sample_rank", "sample_score")
      .as[(String, Int, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._3).sameElements(
        sorted.map(_._3).sorted(Ordering[Double].reverse)))
    }
  }
}
