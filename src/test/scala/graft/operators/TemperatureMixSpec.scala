package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class TemperatureMixSpec extends GraftTestBase {
  import spark.implicits._

  private def counts = Seq(
    ("big", 8000L), ("mid", 1500L), ("small", 400L), ("tiny", 100L))
    .toDF("src", "n")

  private def allocMap(alphaQuarters: Int, budget: Long = 10000L) =
    TemperatureMix.allocate(counts, "src", "n", budget, alphaQuarters)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("α=1 is exact proportional largest-remainder apportionment") {
    // total 10000 and budget 10000: quotas are exact, no remainders
    assert(allocMap(4) ==
      Map("big" -> 8000L, "mid" -> 1500L, "small" -> 400L, "tiny" -> 100L))
  }

  test("α=0 is uniform (remainders to the lexicographically smaller key)") {
    // 10000/4 = 2500 each, exact
    assert(allocMap(0).values.toSet == Set(2500L))
    // 10 units over 4 sources: 2 each + 1 extra to the 2 smaller keys
    // (all remainders tie at 0.5, key order breaks them)
    assert(allocMap(0, budget = 10L) ==
      Map("big" -> 3L, "mid" -> 3L, "small" -> 2L, "tiny" -> 2L))
  }

  test("allocateGrouped = one independent allocation per group, budget-exact") {
    val grouped = Seq(
      ("h1", "big", 8000L), ("h1", "mid", 1500L), ("h1", "small", 400L),
      ("h2", "big", 8000L), ("h2", "tiny", 100L))
      .toDF("holdout", "src", "n")
    val got = TemperatureMix
      .allocateGrouped(grouped, "holdout", "src", "n", 1000L, 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    // each group sums to exactly the budget
    assert(got.filter(_._1._1 == "h1").values.sum == 1000L)
    assert(got.filter(_._1._1 == "h2").values.sum == 1000L)
    // and each group matches the single-frame allocate() run bit-for-bit
    for (h <- Seq("h1", "h2")) {
      val solo = TemperatureMix.allocate(
          grouped.filter($"holdout" === h).select($"src", $"n"),
          "src", "n", 1000L, 2)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val slice = got.collect { case ((g, k), a) if g == h => k -> a }.toMap
      assert(slice == solo, s"group $h diverged: $slice vs $solo")
    }
  }

  test("allocations always sum to exactly the budget") {
    for (q <- Seq(0, 1, 2, 3, 4, 5); b <- Seq(1L, 7L, 997L, 10000L)) {
      val m = allocMap(q, b)
      assert(m.values.sum == b, s"α=$q/4 budget=$b: $m")
    }
  }

  test("intermediate α up-weights small sources monotonically") {
    // as α drops from 1 toward 0, the smallest source's share never
    // shrinks and the biggest source's never grows
    val byAlpha = Seq(4, 3, 2, 0).map(q => allocMap(q))
    byAlpha.sliding(2).foreach {
      case Seq(hi, lo) =>
        assert(lo("tiny") >= hi("tiny"), s"tiny shrank: $hi -> $lo")
        assert(lo("big") <= hi("big"), s"big grew: $hi -> $lo")
      case _ =>
    }
    // and the α=1/2 point matches the hand-computed sqrt weights
    val a2 = allocMap(2)
    val w = Map("big" -> math.sqrt(8000.0), "mid" -> math.sqrt(1500.0),
      "small" -> math.sqrt(400.0), "tiny" -> math.sqrt(100.0))
    val tw = Seq("big", "mid", "small", "tiny").map(w).sum
    w.foreach { case (k, wk) =>
      val quota = 10000.0 * wk / tw
      assert(math.abs(a2(k) - quota) <= 1.0,
        s"$k alloc ${a2(k)} vs quota $quota")
    }
  }

  test("weightExpr α=1 returns n exactly and α=0 returns 1") {
    val r = counts
      .select(TemperatureMix.weightExpr(col("n"), 4).as("w4"),
        TemperatureMix.weightExpr(col("n"), 0).as("w0"),
        col("n").cast("double").as("nd"))
      .collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(2), "α=1 weight not exact n")
      assert(row.getDouble(1) == 1.0)
    }
  }

  test("sample draws exactly the allocated per-bucket counts, deterministically") {
    import spark.implicits._
    val df = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "mid"))).toDF("id", "src")
    val alloc = TemperatureMix.allocate(
        df.groupBy("src").count().withColumnRenamed("count", "n"),
        "src", "n", budget = 200L, alphaQuarters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val sampled = TemperatureMix.sample(df, "src", "id",
      budget = 200L, alphaQuarters = 2).localCheckpoint()
    val got = sampled.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == alloc, s"draw $got != allocation $alloc")
    assert(got.values.sum == 200L, s"budget missed: $got")
    // α=1/2 up-weights the small bucket past its 10% proportional share
    assert(got("mid") > 20L, s"temperature did not up-weight: $got")
    // deterministic membership, not just counts
    val again = TemperatureMix.sample(df, "src", "id", 200L, 2)
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
  }

  test("sampleWithEpochs fills undersupplied quotas exactly via repetition") {
    import spark.implicits._
    // big: 90 rows, tiny: 10 rows; α=0 budget 100 → 50 each: big draws
    // 50 of 90 (epoch 0 only), tiny repeats — 5 full epochs of 10
    val df = ((0 until 90).map(i => (i.toLong, "big")) ++
      (100 until 110).map(i => (i.toLong, "tiny"))).toDF("id", "src")
    val out = TemperatureMix.sampleWithEpochs(df, "src", "id",
      budget = 100L, alphaQuarters = 0).localCheckpoint()
    val counts = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 50L, "tiny" -> 50L), s"counts: $counts")
    // tiny's 50 units = epochs 0..4, each the complete 10-row bucket
    val tinyEpochs = out.filter($"src" === "tiny").groupBy("epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tinyEpochs == (0L to 4L).map(_ -> 10L).toMap, s"$tinyEpochs")
    // big never repeats: one epoch, and it matches the plain sample
    val bigIds = out.filter($"src" === "big")
    assert(bigIds.select("epoch").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
    val plain = TemperatureMix.sample(df, "src", "id", 100L, 0)
      .filter($"src" === "big").select("id")
    assert(bigIds.select("id").exceptAll(plain).isEmpty &&
      plain.exceptAll(bigIds.select("id")).isEmpty,
      "epoch-0 draw diverged from the plain sample")
  }
}
