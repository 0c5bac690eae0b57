package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class CdcMergeSpec extends GraftTestBase {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "bal")

  test("insert, update, delete, and passthrough in one merge") {
    val changes = Seq(
      (2L, "U", 1, "b2", 21.0),   // update existing
      (3L, "D", 1, null, 0.0),    // delete existing
      (5L, "I", 1, "e", 50.0))    // insert new
      .toDF("k", "op", "seq", "name", "bal")
    val out = CdcMerge(base, changes, "k").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("latest change per key wins regardless of row order") {
    val changes = Seq(
      (1L, "D", 3, null, 0.0),    // final state: deleted
      (1L, "U", 1, "x1", 11.0),
      (1L, "U", 2, "x2", 12.0),
      (2L, "U", 2, "b2", 22.0),   // final state: second update
      (2L, "U", 1, "b1", 21.0))
      .toDF("k", "op", "seq", "name", "bal")
    val out = CdcMerge(base, changes, "k").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert semantics: I on existing key replaces, D on missing key is a no-op") {
    val changes = Seq(
      (1L, "I", 1, "a9", 99.0),
      (9L, "D", 1, null, 0.0))
      .toDF("k", "op", "seq", "name", "bal")
    val out = CdcMerge(base, changes, "k").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a9", 99.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("empty change set returns the base unchanged") {
    val changes = Seq.empty[(Long, String, Int, String, Double)]
      .toDF("k", "op", "seq", "name", "bal")
    assert(CdcMerge(base, changes, "k").exceptAll(base).isEmpty)
    assert(base.exceptAll(CdcMerge(base, changes, "k")).isEmpty)
  }
}
