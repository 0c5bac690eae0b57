package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

class StratifiedSplitSpec extends GraftTestBase {

  private val splits = Seq(("train", 80), ("val", 10), ("test", 10))

  test("largest-remainder quotas are exact on a crafted tiny stratum") {
    import spark.implicits._
    // 13 rows at 80/10/10: floors 10/1/1 leave 1 extra; remainders are
    // 40/30/30 so TRAIN takes it → 11/1/1. A 10-row stratum splits
    // exactly 8/1/1 (the case per-row hashing gets wrong).
    val df = ((1 to 13).map(i => (i.toLong, "a")) ++
      (21 to 30).map(i => (i.toLong, "b"))).toDF("id", "src")
    val got = StratifiedSplit.assign(df, "id", "src", splits)
      .groupBy("src", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "train")) == 11 && got(("a", "val")) == 1 &&
      got(("a", "test")) == 1, s"stratum a: $got")
    assert(got(("b", "train")) == 8 && got(("b", "val")) == 1 &&
      got(("b", "test")) == 1, s"stratum b: $got")
  }

  test("every doc assigned exactly once; per-stratum counts within 1 of target") {
    val docs = Tables(spark, sf001)("documents")
    val a = StratifiedSplit.assign(docs, "doc_id", "source", splits)
      .localCheckpoint()
    assert(a.count() == docs.count())
    assert(a.select("doc_id").distinct().count() == docs.count())
    val counts = a.groupBy("source", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ns = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ns.foreach { case (src, n) =>
      splits.foreach { case (nm, pct) =>
        val c = counts.getOrElse((src, nm), 0L)
        val target = n * pct / 100.0
        assert(math.abs(c - target) < 1.0, s"$src/$nm: $c vs $target")
      }
    }
  }

  test("assignment is deterministic across runs") {
    val docs = Tables(spark, sf001)("documents")
    val a = StratifiedSplit.assign(docs, "doc_id", "source", splits)
    val b = StratifiedSplit.assign(docs, "doc_id", "source", splits)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
