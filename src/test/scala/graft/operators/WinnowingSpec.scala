package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.GraftTestBase

class WinnowingSpec extends GraftTestBase {
  import spark.implicits._

  private val K = 4
  private val W = 4

  private def fpSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    Winnowing.fingerprints(df, "doc_id", "text", K, W)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // Docs 1 and 2 share exactly w+k-1 = 7 consecutive tokens embedded
    // in otherwise-disjoint text; doc 3 shares nothing with either.
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two three $shared four five six seven eight"),
      (2L, s"red green blue $shared yellow purple orange pink brown"),
      (3L, "cat dog bird fish horse goat sheep cow duck hen pig")
    ).toDF("doc_id", "text")
    val fps = fpSets(docs)
    assert((fps(1L) & fps(2L)).nonEmpty,
      "docs sharing a full window must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint token universes must not collide at this scale")
  }

  test("selection density is bounded by 1 per window and positions stay in range") {
    val docs = Seq((1L, (1 to 40).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Winnowing.selections(docs, "doc_id", "text", K, W)
      .select(col("n_grams"), col("sel")).head()
    val nGrams = r.getInt(0)
    val sel = r.getSeq[Long](1)
    val nWindows = nGrams - (W - 1)
    assert(sel.size <= nWindows, "never more selections than windows")
    // every packed key decodes to a position inside [1, n_grams] and a
    // 32-bit hash
    sel.foreach { c =>
      val pos = Winnowing.Shift - (c % Winnowing.Shift)
      val h = c >> 31
      assert(pos >= 1 && pos <= nGrams, s"position $pos out of range")
      assert(h >= 0 && h < (1L << 32), s"hash $h not 32-bit")
    }
  }

  test("rightmost-min tie-break: a repeated gram selects its later position") {
    // 11 identical tokens => every gram is identical, so every window
    // min is the SAME hash; packing 2^31 - i makes the largest i win,
    // so each window j selects its last gram (position j + W - 1).
    val docs = Seq((1L, Array.fill(11)("same").mkString(" ")))
      .toDF("doc_id", "text")
    val sel = Winnowing.selections(docs, "doc_id", "text", K, W)
      .select(col("sel")).head().getSeq[Long](0)
    val positions = sel.map(c => Winnowing.Shift - (c % Winnowing.Shift)).toSet
    // n_grams = 8, windows start j=1..5, rightmost pick = j+3 => {4..8}
    assert(positions == Set(4L, 5L, 6L, 7L, 8L))
  }

  test("documents shorter than k+w-1 tokens are dropped") {
    val docs = Seq((1L, (1 to (K + W - 2)).map(i => s"t$i").mkString(" ")),
                   (2L, (1 to (K + W - 1)).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ids = Winnowing.selections(docs, "doc_id", "text", K, W)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("profile is computed without any shuffle") {
    val docs = Seq((1L, (1 to 30).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val plan = Winnowing.profile(docs, "doc_id", "text", K, W)
      .queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"winnowing profile must be map-side only:\n$plan")
  }
}
