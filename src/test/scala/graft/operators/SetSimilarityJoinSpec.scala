package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class SetSimilarityJoinSpec extends GraftTestBase {

  /** Brute-force shingle Jaccard on the driver, over the same tokenizer
    * and k-gram definition. */
  private def bruteForce(docs: Seq[(Long, String)], k: Int,
                         tau: Double): Set[(Long, Long, Int, Int)] = {
    def shingles(text: String): Set[String] = {
      val t = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      if (t.length < k) Set.empty
      else t.sliding(k).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, txt) => id -> shingles(txt) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      i = (sa intersect sb).size; u = (sa union sb).size
      if i.toDouble / u >= tau
    } yield (ia, ib, i, u)).toSet
  }

  private val corpus: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    Seq(
      1L -> base,
      2L -> (base + " again"),                       // near-dup of 1
      3L -> base.replace("quick", "slow"),            // near-dup of 1
      4L -> "completely different words about spark partitions and shuffles here",
      5L -> "completely different words about spark partitions and shuffles here", // exact dup of 4
      6L -> "short text",                              // below k tokens
      7L -> "another unrelated document describing parquet footers and row groups in detail"
    )
  }

  test("finds exactly the brute-force pairs (prefix filter loses nothing)") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    for (tau <- Seq(0.4, 0.6, 0.8)) {
      val expect = bruteForce(corpus, k = 3, tau = tau)
      val got = SetSimilarityJoin.pairs(df, "doc_id", "text", k = 3, tau = tau)
        .select("id_a", "id_b", "n_inter", "n_union").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt,
          r.getLong(3).toInt)).toSet
      assert(got == expect, s"tau=$tau: got $got expected $expect")
    }
  }

  test("exact duplicates report jaccard 1.0") {
    import spark.implicits._
    val out = SetSimilarityJoin.pairs(corpus.toDF("doc_id", "text"),
        "doc_id", "text", k = 3, tau = 0.9)
      .filter(col("id_a") === 4L && col("id_b") === 5L)
      .select("jaccard").collect()
    assert(out.length == 1 && out.head.getDouble(0) == 1.0)
  }

  test("result is invariant to input partitioning") {
    import spark.implicits._
    def run(parts: Int) =
      SetSimilarityJoin.pairs(corpus.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", k = 3, tau = 0.5)
        .orderBy("id_a", "id_b").collect().toSeq
    assert(run(1) == run(5))
  }
}
