package graft.quality

import graft.GraftTestBase

class ExpectationsSpec extends GraftTestBase {
  import spark.implicits._
  import Expectations.{NotNull, Unique, InRange, InSet, ForeignKey}

  private def tables = Map(
    "t" -> Seq((1L, "a", 5.0), (2L, "b", 7.0), (2L, null: String, 50.0))
      .toDF("id", "cat", "x"),
    "ref" -> Seq(Tuple1(1L), Tuple1(2L)).toDF("k"))

  test("rules on one table fold into a single row per rule with exact counts") {
    val out = Expectations.run(spark, tables, Seq(
      NotNull("r1", "t", "cat"),
      Unique("r2", "t", "id"),
      InRange("r3", "t", "x", 0.0, 10.0),
      InSet("r4", "t", "cat", Seq("a", "b"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getInt(4))).toMap
    assert(out("r1") == (1L, 0)) // one null cat
    assert(out("r2") == (1L, 0)) // id 2 twice
    assert(out("r3") == (1L, 0)) // x=50 out of range
    assert(out("r4") == (1L, 0)) // null cat violates in_set too
  }

  test("fk rule counts only non-null probes missing from the reference") {
    val t = Map(
      "t" -> Seq(Tuple1(Option(1L)), Tuple1(Option(9L)), Tuple1(Option.empty[Long]))
        .toDF("fk"),
      "ref" -> Seq(Tuple1(1L), Tuple1(2L)).toDF("k"))
    val out = Expectations.run(spark, t, Seq(ForeignKey("f1", "t", "fk", "ref", "k")))
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(3) == 1L) // 9 missing; null excluded
    assert(out.head.getInt(4) == 0)
  }

  test("a fully clean rule set reports passed=1 everywhere") {
    val out = Expectations.run(spark, tables, Seq(
      NotNull("c1", "t", "id"),
      InRange("c2", "t", "x", 0.0, 100.0)))
    assert(out.collect().forall(_.getInt(4) == 1))
  }

  test("an empty rule list is rejected with a clear error") {
    val e = intercept[IllegalArgumentException] {
      Expectations.run(spark, tables, Seq.empty)
    }
    assert(e.getMessage.contains("at least one rule"))
  }
}
