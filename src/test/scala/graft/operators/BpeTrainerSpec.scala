package graft.operators

import graft.GraftTestBase

/** BPE training semantics pinned on the textbook corpus family
  * (low/lower/newest/widest): hand-computed merge order including a
  * lexicographic tie-break, plus local-vs-distributed equivalence. */
class BpeTrainerSpec extends GraftTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "low low low lower lower"),
    (2L, "newest newest newest newest widest"))
    .toDF("doc_id", "text")

  test("learns the hand-computed merge order with lexicographic tie-breaks") {
    val got = BpeTrainer.train(corpus, "text", merges = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // iter1: (w,e) 6 [lower 2 + newest 4]
    // iter2: (l,o) 5 ties (s,t) 5 -> lexicographic
    // iter3: (s,t) 5
    // iter4: (e,we) 4 ties (n,e) and (we,st) -> "e" < "n" < "we"
    assert(got.toSeq == Seq(
      (1, "w", "e", 6L), (2, "l", "o", 5L),
      (3, "s", "t", 5L), (4, "e", "we", 4L)))
  }

  test("driver-local path equals the distributed loop") {
    val dist = BpeTrainer.train(corpus, "text", merges = 6)
      .orderBy("merge_rank").collect().map(_.toString).toSeq
    val local = BpeTrainer.train(corpus, "text", merges = 6,
        localThreshold = 1000L)
      .orderBy("merge_rank").collect().map(_.toString).toSeq
    assert(dist == local)
  }

  test("greedy leftmost rewrite: overlapping pairs never double-merge") {
    // "aaa" under merge (a,a): leftmost pair merges, third 'a' survives
    // -> next iteration's top pair is (aa, a)
    val df = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val got = BpeTrainer.train(df, "text", merges = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // dict: {aaa: 3}; pairs: (a,a) counted at positions 1-2 and 2-3 -> 6
    assert(got(0) == ((1, "a", "a", 6L)))
    assert(got(1) == ((2, "aa", "a", 3L)))
  }

  test("segment applies the learned merges in rank order (train->apply round trip)") {
    val seg = BpeTrainer.segment(corpus, "text", merges = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getString(3))).toMap
    // merges: (w,e), (l,o), (s,t), (e,we)
    assert(seg("low") == ((3L, 2, "lo w")))
    assert(seg("lower") == ((2L, 3, "lo we r")))
    assert(seg("newest") == ((4L, 3, "n ewe st")))
    assert(seg("widest") == ((1L, 5, "w i d e st")))
  }

  test("stops early when no adjacent pairs remain") {
    val df = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val got = BpeTrainer.train(df, "text", merges = 10).collect()
    // merges: (a,b) 2, (c,d) 1 -> dictionary fully collapsed after 2
    assert(got.length == 2)
  }
}
