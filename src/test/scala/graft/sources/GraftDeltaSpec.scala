package graft.sources

import graft.GraftTestBase

/** Delta-based (merge-on-read) row-level operations: tables created
  * with write.mode='delta' plan WriteDelta — a positional op log keyed
  * by the _pos row id — instead of the group-based ReplaceData
  * rewrite. */
class GraftDeltaSpec extends GraftTestBase {

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gdel", classOf[GraftCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdel.db")
  }

  test("delta table plans WriteDelta; group table plans ReplaceData") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gdel.db.d1")
    spark.sql("DROP TABLE IF EXISTS gdel.db.g1")
    spark.sql(
      "CREATE TABLE gdel.db.d1 (k INT, v STRING) TBLPROPERTIES ('write.mode'='delta')")
    spark.sql("CREATE TABLE gdel.db.g1 (k INT, v STRING)")
    val dPlan = spark.sql("EXPLAIN UPDATE gdel.db.d1 SET v = 'x' WHERE k = 1")
      .head.getString(0)
    val gPlan = spark.sql("EXPLAIN UPDATE gdel.db.g1 SET v = 'x' WHERE k = 1")
      .head.getString(0)
    assert(dPlan.contains("WriteDelta"), dPlan.take(400))
    assert(gPlan.contains("ReplaceData"), gPlan.take(400))
  }

  test("UPDATE / DELETE / MERGE land correctly through the delta op log") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gdel.db.t")
    spark.sql(
      "CREATE TABLE gdel.db.t (k INT, v STRING) TBLPROPERTIES ('write.mode'='delta')")
    spark.sql("INSERT INTO gdel.db.t VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    spark.sql("UPDATE gdel.db.t SET v = upper(v) WHERE k >= 3")
    spark.sql("DELETE FROM gdel.db.t WHERE length(v) = 1 AND k = 2")
    spark.sql("""
      MERGE INTO gdel.db.t t
      USING (SELECT * FROM VALUES (1,'z'), (5,'e') AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val got = spark.sql("SELECT k, v FROM gdel.db.t ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "z"), (3, "C"), (4, "D"), (5, "e")))
  }

  test("delta updates only touch matched rows (op-log, not group rewrite)") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gdel.db.narrow")
    spark.sql(
      "CREATE TABLE gdel.db.narrow (k INT) TBLPROPERTIES ('write.mode'='delta')")
    spark.sql("INSERT INTO gdel.db.narrow SELECT explode(sequence(1, 1000))")
    spark.sql("UPDATE gdel.db.narrow SET k = -k WHERE k = 500")
    assert(spark.sql("SELECT count(*) FROM gdel.db.narrow").head.getLong(0)
      == 1000)
    assert(spark.sql("SELECT count(*) FROM gdel.db.narrow WHERE k = -500")
      .head.getLong(0) == 1)
    // snapshot history advanced exactly once for the update
    val hist = spark.sql("CALL gdel.system.table_history('db.narrow')")
      .collect()
    assert(hist.length == 3) // create, insert, update
  }

  test("delta commit fails when the table advanced past the scanned snapshot") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gdel.db.cc")
    spark.sql(
      "CREATE TABLE gdel.db.cc (k INT, v STRING) TBLPROPERTIES ('write.mode'='delta')")
    spark.sql("INSERT INTO gdel.db.cc VALUES (1,'a'), (2,'b')")
    val key = "cat:gdel:db.cc"
    val schema = GraftMemoryStore.schemaOf(key).get
    val scanned = GraftMemoryStore.latestVersion(key)
    // a rewrite pinned to `scanned` produced this op log (delete _pos 0)
    val write = new GraftDeltaWrite(key, schema, scanned)
    val batch = write.toBatch()
    // ...but a concurrent writer lands BETWEEN the scan and the commit,
    // shifting every position in the snapshot
    spark.sql("INSERT INTO gdel.db.cc VALUES (0,'z')")
    val ex = intercept[GraftConcurrentWriteException] {
      batch.commit(Array(GraftDeltaCommit(Vector(GraftDeltaDelete(0L)))))
    }
    assert(ex.getMessage.contains("advanced past scanned snapshot"))
    // the conflicting commit must not have touched the table
    assert(spark.sql("SELECT count(*) FROM gdel.db.cc").head.getLong(0) == 3)
    // with the table quiescent again, the same op log re-planned against
    // the CURRENT snapshot applies cleanly
    spark.sql("DELETE FROM gdel.db.cc WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM gdel.db.cc").head.getLong(0) == 2)
  }
}
