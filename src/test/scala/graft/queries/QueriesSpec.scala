package graft.queries

import graft.{GraftTestBase, SparkEntry}

/** Smoke + invariant checks for every SparkEntry query at sf0.001.
  * (Value-level correctness is the driver's DuckDB-oracle gate plus
  * tools/check.py locally; this spec guards structure and invariants.) */
class QueriesSpec extends GraftTestBase {

  test("every query runs at sf0.001 and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    val rowless = Set("q26_minhash_lsh", "q27_simhash") // candidate sets may be empty
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      val n  = df.count()
      assert(rowless.contains(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("fk integrity reports zero orphans on the synthetic star schema") {
    val rows = SparkEntry.queries("q16_fk_integrity")(spark, sf001).collect()
    assert(rows.length == 5 && rows.forall(_.getAs[Long]("orphan_keys") == 0L))
  }

  test("row counts match known table sizes at sf0.001") {
    val m = SparkEntry.queries("q17_row_counts")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_rows")).toMap
    assert(m("region") == 5 && m("nation") == 25 && m("lineitem") == 6000)
  }

  test("null profile reports zero nulls on lineitem") {
    val row = SparkEntry.queries("q09_null_profile")(spark, sf001).collect().head
    (0 until row.length).foreach(i => assert(row.getDouble(i) == 0.0))
  }
}
