package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Round-11 part 2: semi-hard negative mining, ratio-margin bitext
  * scoring, and curriculum interleaving. */
class ContrastiveMiningSpec extends GraftTestBase {
  import spark.implicits._

  private val dim = 8

  /** Anchor (label 0) plus candidates engineered around the semi-hard
    * band: a same-direction near-dup (excluded: cos ≥ hi), a mid-cosine
    * other-label vector (the wanted semi-hard negative), a same-label
    * mid-cosine vector (excluded: presumed positive), and an orthogonal
    * vector (excluded: cos < lo). Same-direction vectors share every SRP
    * band by construction (identical sign pattern). */
  private def labeled = Seq(
    (0L, Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f), 0),         // anchor
    (1L, Array(0.99f, 0f, 0f, 0f, 1.01f, 0f, 0f, 0f), 1),   // near-dup
    (2L, Array(1f, 0.9f, 0f, 0.9f, 1f, 0f, 0.9f, 0f), 1),   // semi-hard
    (3L, Array(1f, 0.9f, 0f, 0.9f, 1f, 0f, 0.9f, 0f), 0),   // same label
    (4L, Array(0f, 1f, 0f, 1f, 0f, 0f, 1f, 0f), 1))         // too far
    .toDF("vec_id", "embedding", "label")

  test("hardNegatives keeps only other-label, in-band candidates") {
    val anchors = labeled.filter($"vec_id" === 0L)
    // precondition: the semi-hard candidate must share at least one SRP
    // band with the anchor, or the index can't surface it at all
    def sig(v: Array[Float], bits: Int): Int =
      (0 until bits).map { b =>
        val h = Similarity.hyperplane(b, dim)
        val d = v.zipWithIndex.map { case (x, i) => x * h(i) }.sum
        if (d > 0) 1 << b else 0
      }.sum
    val bits = 8; val bands = 4; val r = bits / bands; val mask = (1 << r) - 1
    val sa = sig(Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f), bits)
    val sc = sig(Array(1f, 0.9f, 0f, 0.9f, 1f, 0f, 0.9f, 0f), bits)
    assume((0 until bands).exists(b => ((sa >> (b * r)) & mask) == ((sc >> (b * r)) & mask)))

    val got = Similarity.hardNegatives(labeled, anchors, "vec_id", "embedding",
        "label", k = 5, dim = dim, loCos = 0.1, hiCos = 0.95, bits = bits, bands = bands)
      .collect()
    val ids = got.map(_.getLong(1)).toSet
    assert(ids.contains(2L), s"semi-hard negative missing: ${got.mkString(",")}")
    assert(!ids.contains(1L), "near-dup (cos >= hi) must not be a negative")
    assert(!ids.contains(3L), "same-label candidate must not be a negative")
    assert(!ids.contains(4L), "below-band candidate must not be a negative")
    got.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= 0.1 && c < 0.95, s"cos out of band: $c")
    }
    // ranks are dense from 1 over the surviving set
    assert(got.map(_.getInt(3)).sorted.sameElements(1 to got.length))
  }

  test("marginScores normalizes by both endpoints' neighborhood density") {
    // hand-built kNN relations, k=2: src 100 has neighbors 200 (0.9)
    // and 201 (0.5) -> fwd_avg 0.7; tgt 200's backward avg 0.8,
    // tgt 201's 0.4.
    val fwd = Seq((100L, 200L, 0.9, 1), (100L, 201L, 0.5, 2))
      .toDF("query_id", "neighbor_id", "cos", "rank")
    val bwd = Seq((200L, 100L, 0.9, 1), (200L, 101L, 0.7, 2),
                  (201L, 100L, 0.5, 1), (201L, 102L, 0.3, 2))
      .toDF("query_id", "neighbor_id", "cos", "rank")
    val scored = MarginScoring.scorePairs(fwd, bwd)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(scored((100L, 200L)) - 0.9 / ((0.7 + 0.8) / 2)) < 1e-12)
    assert(math.abs(scored((100L, 201L)) - 0.5 / ((0.7 + 0.4) / 2)) < 1e-12)
    // 200 is a "hub" (dense neighborhood) — its margin is LOWER than
    // raw cosine would suggest; 201 in a sparse neighborhood scores
    // close to the hub pair despite much lower cosine
    assert(scored((100L, 200L)) < 0.9 / 0.7)
    // bestPairs picks the max-margin candidate and applies the floor
    val best = MarginScoring.bestPairs(fwd, bwd, minMargin = 0.95)
      .collect()
    assert(best.length == 1 && best(0).getLong(1) == 200L)
    val none = MarginScoring.bestPairs(fwd, bwd, minMargin = 1.3).collect()
    assert(none.isEmpty)
    // mutual (intersection) strategy: (100, 200) is both 100's best tgt
    // and 200's best src -> survives; the threshold still gates it
    val mutual = MarginScoring.mutualPairs(fwd, bwd, minMargin = 0.95)
      .collect()
    assert(mutual.length == 1 &&
      mutual(0).getLong(0) == 100L && mutual(0).getLong(1) == 200L)
    assert(MarginScoring.mutualPairs(fwd, bwd, minMargin = 1.3).collect().isEmpty)
  }

  test("curriculum interleave: equi-depth tiers, strict round-robin order") {
    // n=10, tiers=4 -> tier sizes 3,2,3,2 (idx*4 div 10)
    val df = (1L to 10L).map(i => (i, i * 10L)).toDF("doc_id", "difficulty")
    val out = Curriculum.interleave(df, "doc_id", "difficulty", tiers = 4)
      .orderBy("ord").collect()
    assert(out.length == 10)
    val tiers = out.map(_.getAs[Long]("tier"))
    val sizes = tiers.groupBy(identity).view.mapValues(_.length).toMap
    assert(sizes == Map(0L -> 3, 1L -> 2, 2L -> 3, 3L -> 2))
    // first cycle visits every tier once, in tier order
    assert(tiers.take(4).sameElements(Array(0L, 1L, 2L, 3L)))
    // ord is strictly increasing and unique
    val ords = out.map(_.getAs[Long]("ord"))
    assert(ords.distinct.length == 10 && ords.sameElements(ords.sorted))
    // within a tier, difficulty still ascends (easy -> hard)
    out.groupBy(_.getAs[Long]("tier")).foreach { case (_, rows) =>
      val diffs = rows.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("difficulty"))
      assert(diffs.sameElements(diffs.sorted))
    }
    // the easiest tier holds the globally easiest docs
    assert(out.filter(_.getAs[Long]("tier") == 0L)
      .map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
  }

  test("ICT pairs: held-out chunk is doc_id mod n_chunks, context is the rest") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1: 10 tokens, chunkTokens=4 -> chunks [t1..t4][t5..t8][t9 t10],
    // q_idx = 1 mod 3 = 1; doc 2: single chunk -> empty context
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"))
      .toDF("doc_id", "text")
    val got = IctPairs.pairs(docs, "doc_id", "text", chunkTokens = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert(d1.getAs[Long]("n_chunks") == 3L && d1.getAs[Long]("q_idx") == 1L)
    assert(d1.getAs[String]("query_md5") == md5hex("t5 t6 t7 t8"))
    assert(d1.getAs[Long]("query_tokens") == 4L)
    assert(d1.getAs[String]("ctx_md5") == md5hex("t1 t2 t3 t4 t9 t10"))
    assert(d1.getAs[Long]("ctx_tokens") == 6L)
    val d2 = got(2L)
    assert(d2.getAs[Long]("n_chunks") == 1L && d2.getAs[Long]("q_idx") == 0L)
    assert(d2.getAs[String]("query_md5") == md5hex("a b c"))
    assert(d2.getAs[String]("ctx_md5") == md5hex(""))
    assert(d2.getAs[Long]("ctx_tokens") == 0L)
  }

  test("curriculum interleave plans no Window operator") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("doc_id", "difficulty")
    val plan = Curriculum.interleave(df, "doc_id", "difficulty", tiers = 4)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"global window leaked into:\n$plan")
  }
}
