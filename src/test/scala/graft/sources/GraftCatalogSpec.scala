package graft.sources

import org.scalatest.BeforeAndAfterAll

import graft.GraftTestBase

/** Full SQL DDL/DML surface against the custom TableCatalog plugin. */
class GraftCatalogSpec extends GraftTestBase with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
  }

  test("CREATE TABLE + INSERT INTO + SELECT round trip") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.kv")
    spark.sql("CREATE TABLE gcat.db.kv (k INT, v STRING)")
    spark.sql("INSERT INTO gcat.db.kv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val got = spark.sql("SELECT k, v FROM gcat.db.kv ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("INSERT OVERWRITE replaces atomically; INSERT INTO appends") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.ow")
    spark.sql("CREATE TABLE gcat.db.ow (k INT)")
    spark.sql("INSERT INTO gcat.db.ow VALUES (1), (2)")
    spark.sql("INSERT INTO gcat.db.ow VALUES (3)")
    assert(spark.sql("SELECT count(*) FROM gcat.db.ow").head.getLong(0) == 3)
    spark.sql("INSERT OVERWRITE gcat.db.ow VALUES (9)")
    val got = spark.sql("SELECT k FROM gcat.db.ow").collect().map(_.getInt(0))
    assert(got.toSeq == Seq(9))
  }

  test("CTAS from a parquet-backed query") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.regions")
    graft.Tables(spark, sf001).registerAll()
    spark.sql(
      """CREATE TABLE gcat.db.regions AS
         SELECT r_regionkey, r_name FROM region""")
    assert(spark.sql("SELECT count(*) FROM gcat.db.regions").head.getLong(0) == 5)
    val names = spark.sql(
      "SELECT r_name FROM gcat.db.regions ORDER BY r_name")
      .collect().map(_.getString(0))
    assert(names.contains("EUROPE"))
  }

  test("DELETE FROM pushes supported predicates into the table") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.del")
    spark.sql("CREATE TABLE gcat.db.del (k INT, v STRING)")
    spark.sql(
      "INSERT INTO gcat.db.del VALUES (1,'a'), (2,'b'), (3,'c'), (4,NULL)")
    spark.sql("DELETE FROM gcat.db.del WHERE k < 3")
    assert(spark.sql("SELECT k FROM gcat.db.del ORDER BY k")
      .collect().map(_.getInt(0)).toSeq == Seq(3, 4))
    spark.sql("DELETE FROM gcat.db.del WHERE v IS NULL")
    assert(spark.sql("SELECT k FROM gcat.db.del").collect()
      .map(_.getInt(0)).toSeq == Seq(3))
    // compound predicate: AND of comparisons
    spark.sql("INSERT INTO gcat.db.del VALUES (5,'e'), (6,'f')")
    spark.sql("DELETE FROM gcat.db.del WHERE k >= 5 AND v = 'e'")
    assert(spark.sql("SELECT k FROM gcat.db.del ORDER BY k").collect()
      .map(_.getInt(0)).toSeq == Seq(3, 6))
  }

  test("pushed BIGINT comparisons are exact above 2^53") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.big")
    spark.sql("CREATE TABLE gcat.db.big (k BIGINT, v STRING)")
    // 2^53, 2^53+1, 2^53+2 all collapse to the same double
    spark.sql(
      """INSERT INTO gcat.db.big VALUES
         (9007199254740992, 'a'), (9007199254740993, 'b'),
         (9007199254740994, 'c')""")
    val eq = spark.sql(
      "SELECT v FROM gcat.db.big WHERE k = 9007199254740993")
      .collect().map(_.getString(0))
    assert(eq.toSeq == Seq("b"), s"double-rounded pushdown would match all three: $eq")
    val lt = spark.sql(
      "SELECT v FROM gcat.db.big WHERE k < 9007199254740994 ORDER BY v")
      .collect().map(_.getString(0))
    assert(lt.toSeq == Seq("a", "b"))
    spark.sql("DELETE FROM gcat.db.big WHERE k = 9007199254740992")
    assert(spark.sql("SELECT count(*) FROM gcat.db.big").head.getLong(0) == 2,
      "exact DELETE must remove exactly one of the 2^53-neighborhood rows")
  }

  test("TRUNCATE TABLE empties but keeps the table") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.tr")
    spark.sql("CREATE TABLE gcat.db.tr (k INT)")
    spark.sql("INSERT INTO gcat.db.tr VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE gcat.db.tr")
    assert(spark.sql("SELECT count(*) FROM gcat.db.tr").head.getLong(0) == 0)
    spark.sql("INSERT INTO gcat.db.tr VALUES (7)")
    assert(spark.sql("SELECT k FROM gcat.db.tr").head.getInt(0) == 7)
  }

  test("SHOW TABLES / DROP TABLE / RENAME") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.a")
    spark.sql("DROP TABLE IF EXISTS gcat.db.b")
    spark.sql("CREATE TABLE gcat.db.a (x INT)")
    spark.sql("INSERT INTO gcat.db.a VALUES (42)")
    val listed = spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1))
    assert(listed.contains("a"))
    spark.sql("ALTER TABLE gcat.db.a RENAME TO gcat.db.b")
    assert(spark.sql("SELECT x FROM gcat.db.b").head.getInt(0) == 42)
    assert(!spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("a"))
    spark.sql("DROP TABLE gcat.db.b")
    assert(!spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("b"))
  }

  test("schema is enforced on INSERT (no ACCEPT_ANY_SCHEMA laxity)") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.strict")
    spark.sql("CREATE TABLE gcat.db.strict (k INT, v STRING)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcat.db.strict VALUES (1)")
    }
    assert(e.getMessage.toLowerCase.contains("column") ||
      e.getMessage.toLowerCase.contains("insert"))
  }

  test("reported statistics make a small catalog table the broadcast side") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    spark.sql("DROP TABLE IF EXISTS gcat.db.dim")
    graft.Tables(spark, sf001).registerAll()
    spark.sql("CREATE TABLE gcat.db.dim AS SELECT n_nationkey, n_name FROM nation")
    val df = spark.sql(
      """SELECT c.c_custkey, d.n_name
         FROM customer c JOIN gcat.db.dim d ON c.c_nationkey = d.n_nationkey""")
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty,
      "25-row catalog table should broadcast from reported stats (no hint)")
  }

  test("supported filters push into the scan; unsupported stay in the plan") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    spark.sql("DROP TABLE IF EXISTS gcat.db.fp")
    spark.sql("CREATE TABLE gcat.db.fp (k INT, v STRING)")
    spark.sql("INSERT INTO gcat.db.fp VALUES (1,'a'), (2,'bb'), (3,'ccc'), (4,'dd')")
    def unwrap(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p                        => p
      }
    // fully-pushable comparison: no residual Filter node survives
    val pushedDf = spark.sql("SELECT k FROM gcat.db.fp WHERE k >= 3")
    assert(unwrap(pushedDf).collect { case f: FilterExec => f }.isEmpty,
      "pushable predicate left a Filter in the plan")
    assert(pushedDf.collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4))
    // unsupported predicate stays as a post-scan Filter, results correct
    val residDf = spark.sql("SELECT k FROM gcat.db.fp WHERE length(v) = 2")
    assert(unwrap(residDf).collect { case f: FilterExec => f }.nonEmpty)
    assert(residDf.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4))
  }

  test("VERSION AS OF time travel reads committed snapshots") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.tt")
    spark.sql("CREATE TABLE gcat.db.tt (k INT)")            // v0: empty
    spark.sql("INSERT INTO gcat.db.tt VALUES (1)")          // v1
    spark.sql("INSERT INTO gcat.db.tt VALUES (2), (3)")     // v2
    spark.sql("UPDATE gcat.db.tt SET k = k * 10 WHERE k > 1") // v3
    def at(v: Int) = spark.sql(
      s"SELECT k FROM gcat.db.tt VERSION AS OF $v ORDER BY k")
      .collect().map(_.getInt(0)).toSeq
    assert(at(0) == Seq())
    assert(at(1) == Seq(1))
    assert(at(2) == Seq(1, 2, 3))
    assert(at(3) == Seq(1, 20, 30))
    // current read == latest snapshot
    assert(spark.sql("SELECT k FROM gcat.db.tt ORDER BY k")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 20, 30))
    // FOR SYSTEM_VERSION AS OF is the SQL-standard spelling
    assert(spark.sql(
      "SELECT k FROM gcat.db.tt FOR SYSTEM_VERSION AS OF 2 ORDER BY k")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.db.tt VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("out of range"))
  }

  test("ALTER TABLE schema evolution with version-correct time travel") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.evo")
    spark.sql("CREATE TABLE gcat.db.evo (k INT)")            // v0
    spark.sql("INSERT INTO gcat.db.evo VALUES (1), (2)")     // v1
    spark.sql("ALTER TABLE gcat.db.evo ADD COLUMNS (v STRING)") // v2
    spark.sql("INSERT INTO gcat.db.evo VALUES (3, 'c')")     // v3
    assert(spark.sql("SELECT * FROM gcat.db.evo").columns.toSeq ==
      Seq("k", "v"))
    val rows = spark.sql("SELECT k, v FROM gcat.db.evo ORDER BY k")
      .collect().map(r => (r.getInt(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq((1, None), (2, None), (3, Some("c"))))
    // time travel BEFORE the alter reads the old single-column schema
    val old = spark.sql("SELECT * FROM gcat.db.evo VERSION AS OF 1")
    assert(old.columns.toSeq == Seq("k"))
    assert(old.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // rename + drop migrate rows in place
    spark.sql("ALTER TABLE gcat.db.evo RENAME COLUMN v TO label")
    assert(spark.sql("SELECT label FROM gcat.db.evo WHERE k = 3")
      .head.getString(0) == "c")
    spark.sql("ALTER TABLE gcat.db.evo DROP COLUMN label")
    assert(spark.sql("SELECT * FROM gcat.db.evo").columns.toSeq == Seq("k"))
    assert(spark.sql("SELECT count(*) FROM gcat.db.evo").head.getLong(0) == 3)
  }

  test("CALL procedures: table_history ledger and rollback restore") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.proc")
    spark.sql("CREATE TABLE gcat.db.proc (k INT)")          // v0
    spark.sql("INSERT INTO gcat.db.proc VALUES (1), (2)")   // v1
    spark.sql("INSERT INTO gcat.db.proc VALUES (3)")        // v2
    val hist = spark.sql("CALL gcat.system.table_history('db.proc')")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(hist.toSeq == Seq((0, 0L), (1, 2L), (2, 3L)))
    val rb = spark.sql("CALL gcat.system.rollback('db.proc', 1)")
      .collect().head
    assert((rb.getInt(0), rb.getInt(1), rb.getLong(2)) == ((1, 3, 2L)))
    assert(spark.sql("SELECT k FROM gcat.db.proc ORDER BY k")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    // the rollback itself is snapshot v3 - history is append-only
    assert(spark.sql("CALL gcat.system.table_history('db.proc')")
      .collect().length == 4)
  }

  test("expire_snapshots tombstones old versions; expired reads fail cleanly") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.exp")
    spark.sql("CREATE TABLE gcat.db.exp (k INT)")          // v0
    spark.sql("INSERT INTO gcat.db.exp VALUES (1)")        // v1
    spark.sql("INSERT INTO gcat.db.exp VALUES (2)")        // v2
    spark.sql("INSERT INTO gcat.db.exp VALUES (3)")        // v3
    val n = spark.sql("CALL gcat.system.expire_snapshots('db.exp', 2)")
      .head.getInt(0)
    assert(n == 2) // v0, v1 expired; v2, v3 kept
    // history lists only live snapshots, version numbers unchanged
    val hist = spark.sql("CALL gcat.system.table_history('db.exp')")
      .collect().map(_.getInt(0))
    assert(hist.toSeq == Seq(2, 3))
    // live version still reads; expired one fails with a clear error
    assert(spark.sql("SELECT k FROM gcat.db.exp VERSION AS OF 2")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.db.exp VERSION AS OF 1").collect()
    }
    assert(e.getMessage.contains("expired"))
    // current reads unaffected
    assert(spark.sql("SELECT count(*) FROM gcat.db.exp").head.getLong(0) == 3)
  }

  test("complex DELETE predicate falls back to the group-based rewrite") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.hard")
    spark.sql("CREATE TABLE gcat.db.hard (k INT, v STRING)")
    spark.sql("INSERT INTO gcat.db.hard VALUES (1,'a'), (2,'bb'), (3,'ccc')")
    // length(v) is outside the deleteWhere fragment — Spark plans a
    // row-level rewrite (read all, keep non-matching, replace) instead
    spark.sql("DELETE FROM gcat.db.hard WHERE length(v) > 1")
    assert(spark.sql("SELECT k FROM gcat.db.hard").collect()
      .map(_.getInt(0)).toSeq == Seq(1))
  }

  test("UPDATE rewrites matched rows, keeps the rest") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.upd")
    spark.sql("CREATE TABLE gcat.db.upd (k INT, v STRING)")
    spark.sql("INSERT INTO gcat.db.upd VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("UPDATE gcat.db.upd SET v = upper(v) WHERE k >= 2")
    val got = spark.sql("SELECT k, v FROM gcat.db.upd ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (2, "B"), (3, "C")))
  }

  test("_shard metadata column is selectable but hidden from SELECT *") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.meta")
    spark.sql("CREATE TABLE gcat.db.meta (k INT)")
    spark.sql("INSERT INTO gcat.db.meta VALUES (1), (2)")
    assert(spark.sql("SELECT * FROM gcat.db.meta").columns.toSeq == Seq("k"))
    val got = spark.sql("SELECT k, _shard FROM gcat.db.meta ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq == Seq((1, 0), (2, 0)))
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.tgt")
    spark.sql("CREATE TABLE gcat.db.tgt (k INT, v STRING)")
    spark.sql("INSERT INTO gcat.db.tgt VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("""
      MERGE INTO gcat.db.tgt t
      USING (SELECT * FROM VALUES (2,'B2'), (3,NULL), (4,'d')
             AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED AND s.v IS NULL THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val got = spark.sql("SELECT k, v FROM gcat.db.tgt ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (2, "B2"), (4, "d")))
  }
}
