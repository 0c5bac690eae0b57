package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class AdaptiveGateSpec extends GraftTestBase {

  private def crafted = {
    import spark.implicits._
    // group A: 10 rows, signals 0.1..1.0 → exactly ONE drops (n·10/100
    // = 1); group B: 9 rows → ZERO drop (floor, never a rounded-up 1);
    // group C: 20 rows with the two lowest signals TIED → the id
    // tie-break decides which of the tied pair drops
    val a = (1 to 10).map(i => (i.toLong, "A", i / 10.0))
    val b = (11 to 19).map(i => (i.toLong, "B", (i - 10) / 10.0))
    val c = (21 to 40).map(i =>
      (i.toLong, "C", if (i <= 22) 0.05 else (i - 20) / 10.0))
    (a ++ b ++ c).toDF("id", "grp", "sig")
  }

  test("drop count is the exact integer n·pct/100 per group") {
    val kept = AdaptiveGate.dropBottom(crafted, "grp", "sig", "id", pct = 10)
      .collect().map(_.getLong(0)).toSet
    // A drops exactly its minimum-signal row (id 1)
    assert(!kept.contains(1L) && (2L to 10L).forall(kept))
    // B drops nothing (9·10/100 = 0)
    assert((11L to 19L).forall(kept))
    // C drops exactly 2 (20·10/100): the tied pair (ids 21, 22 at
    // 0.05) resolves by id order — both sit below every other signal
    assert(!kept.contains(21L) && !kept.contains(22L) &&
      (23L to 40L).forall(kept))
  }

  test("per-group thresholds adapt: a global cutoff could not produce this split") {
    // group LOW has signals an order of magnitude below group HIGH;
    // the gate still keeps 90% of each — no single global threshold
    // separates both groups' bottom deciles
    import spark.implicits._
    val low = (1 to 10).map(i => (i.toLong, "low", i / 100.0))
    val high = (11 to 20).map(i => (i.toLong, "high", (i - 10) / 1.0))
    val kept = AdaptiveGate.dropBottom(
        (low ++ high).toDF("id", "grp", "sig"), "grp", "sig", "id", 10)
      .groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("low" -> 9L, "high" -> 9L), s"kept: $kept")
  }

  test("report pins the drop boundary per group") {
    val rep = AdaptiveGate.report(crafted, "grp", "sig", "id", pct = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getDouble(4)))).toMap
    assert(rep("A") == ((10L, 1L, Some(0.1), 0.2)), s"A: ${rep("A")}")
    assert(rep("B")._2 == 0L && rep("B")._3.isEmpty, s"B: ${rep("B")}")
    assert(rep("C")._2 == 2L && rep("C")._3 == Some(0.05), s"C: ${rep("C")}")
  }

  test("pct = 0 is the identity") {
    val kept = AdaptiveGate.dropBottom(crafted, "grp", "sig", "id", 0)
    assert(kept.count() == crafted.count())
  }
}
