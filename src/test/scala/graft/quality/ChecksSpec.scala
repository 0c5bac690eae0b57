package graft.quality

import graft.GraftTestBase

class ChecksSpec extends GraftTestBase {
  import spark.implicits._

  test("fkIntegrity: null FKs are not orphans; real orphans counted distinct") {
    val child = Seq(Some(1L), Some(1L), Some(99L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Checks.fkIntegrity(Seq(
        Checks.FkEdge("child.fk->parent", child, "fk", parent, "pk")))
      .collect().head
    // 99 appears twice but counts once; the null row is ignored
    assert(out.getAs[Long]("orphan_keys") == 1L)
  }

  test("nullProfile counts NaN as bad only for floating columns") {
    val df = Seq((Double.NaN, "x"), (1.0, null.asInstanceOf[String]))
      .toDF("d", "s")
    val row = Checks.nullProfile(df).collect().head
    assert(row.getDouble(0) == 0.5) // NaN counted
    assert(row.getDouble(1) == 0.5) // null counted
  }

  test("rowCounts reports every table") {
    val out = Checks.rowCounts(spark, Seq(
        "a" -> Seq(1, 2, 3).toDF("x"), "b" -> Seq.empty[Int].toDF("x")))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_rows")).toMap
    assert(out == Map("a" -> 3L, "b" -> 0L))
  }
}
