package graft.operators

import org.apache.spark.sql.functions.col

import graft.GraftTestBase

/** Pins the exact-substring span semantics on planted duplicates: the
  * suffix-array criterion (any k-gram occurring >= 2×), interval union
  * into maximal spans, and md5/xxhash64 key-path equivalence. */
class SubstringDedupSpec extends GraftTestBase {
  import spark.implicits._

  private val K = 4

  // doc 0 and 1 share an 8-word run; doc 2 repeats a 5-word phrase
  // internally; doc 3 shares nothing k-gram-sized with anyone.
  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta unique tail zero"),
    (1L, "lead in words alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "red blue green gold silver filler filler2 red blue green gold silver"),
    (3L, "entirely unrelated content about distributed query planning"))
    .toDF("doc_id", "text")

  private def spansOf(id: Long) =
    SubstringDedup.spans(corpus, "doc_id", "text", K)
      .filter(col("doc_id") === id)
      .collect()
      .map(r => (r.getAs[Int]("start_tok"), r.getAs[Int]("end_tok")))
      .sorted
      .toSeq

  test("cross-doc shared run becomes one maximal span per doc") {
    // docs 0/1 share tokens "alpha..theta" (8 words): doc0 offsets 0-7,
    // doc1 offsets 3-10. All 5 shared 4-gram windows chain into one span.
    assert(spansOf(0L) == Seq((0, 7)))
    assert(spansOf(1L) == Seq((3, 10)))
  }

  test("within-doc repetition is duplicated text too (suffix-array criterion)") {
    // doc 2: "red blue green gold silver" at offsets 0-4 and 7-11; the
    // two 4-gram windows per occurrence chain into two spans (gap > k).
    assert(spansOf(2L) == Seq((0, 4), (7, 11)))
  }

  test("documents with no duplicated k-gram emit nothing") {
    assert(spansOf(3L).isEmpty)
  }

  test("profile sums span mass and joins total tokens") {
    val p = SubstringDedup.profile(corpus, "doc_id", "text", K)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_toks"),
         r.getAs[Int]("n_toks"))).toMap
    assert(p(0L) == ((1L, 8L, 11)))
    assert(p(1L) == ((1L, 8L, 11)))
    assert(p(2L) == ((2L, 10L, 12)))
    assert(!p.contains(3L))
  }

  test("xxhash64 production key yields identical spans to the md5 oracle key") {
    val md = SubstringDedup.spans(corpus, "doc_id", "text", K).collect().toSet
    val xx = SubstringDedup
      .spans(corpus, "doc_id", "text", K, SubstringDedup.xxGram)
      .collect().toSet
    assert(md == xx)
  }

  test("touching duplicated windows merge at gap == k, split at gap == k+1") {
    // doc 10: [pa..pd][qa..qd] — the p-gram duplicates into doc 11, the
    // q-gram into doc 12, every straddling gram is unique. Dup window
    // starts {0, 4}: gap exactly k ⇒ intervals [0,3] and [4,7] touch ⇒
    // one maximal span covering the doc.
    val touch = Seq(
      (10L, "pa pb pc pd qa qb qc qd"),
      (11L, "pad pa pb pc pd end marker stuff"),
      (12L, "other qa qb qc qd trailing words here")).toDF("doc_id", "text")
    val s10 = SubstringDedup.spans(touch, "doc_id", "text", K)
      .filter(col("doc_id") === 10L).collect()
      .map(r => (r.getAs[Int]("start_tok"), r.getAs[Int]("end_tok"))).toSeq
    assert(s10 == Seq((0, 7)))

    // doc 20: [pa..pd] z [qa..qd] — dup starts {0, 5}: gap k+1 ⇒ the
    // intervals [0,3] and [5,8] leave token 4 clean ⇒ two spans.
    val split = Seq(
      (20L, "pa pb pc pd z qa qb qc qd"),
      (21L, "pad pa pb pc pd end marker stuff"),
      (22L, "other qa qb qc qd trailing words here")).toDF("doc_id", "text")
    val s20 = SubstringDedup.spans(split, "doc_id", "text", K)
      .filter(col("doc_id") === 20L).collect()
      .map(r => (r.getAs[Int]("start_tok"), r.getAs[Int]("end_tok")))
      .sorted.toSeq
    assert(s20 == Seq((0, 3), (5, 8)))
  }

  test("scrub deletes exactly the duplicated spans, pass-through otherwise") {
    // docs 1,2 share the 4-gram "pa pb pc pd"; doc 3 is fully unique.
    // Scrub must cut the shared window (plus its interval extension)
    // from both carriers and leave doc 3 byte-identical.
    val docs = Seq(
      (1L, "pa pb pc pd alpha beta gamma delta"),
      (2L, "intro pa pb pc pd closing words here"),
      (3L, "a completely unique document with fresh content")).toDF("doc_id", "text")
    val out = SubstringDedup.scrub(docs, "doc_id", "text", K)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((8, 4, "alpha beta gamma delta")))
    assert(out(2L) == ((8, 4, "intro closing words here")))
    assert(out(3L)._3 == "a completely unique document with fresh content")
    assert(out(3L)._1 == out(3L)._2)
    // conservation: kept + dup span mass == n_toks per doc
    val dup = SubstringDedup.spans(docs, "doc_id", "text", K)
      .groupBy("doc_id").agg(org.apache.spark.sql.functions.sum("span_toks").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (n, kept, _)) =>
      assert(n - kept == dup.getOrElse(id, 0L), s"doc $id")
    }
  }
}
