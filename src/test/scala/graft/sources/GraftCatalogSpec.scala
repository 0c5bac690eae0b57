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

  test("unsupported DELETE predicate is rejected, not mis-applied") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.hard")
    spark.sql("CREATE TABLE gcat.db.hard (k INT, v STRING)")
    spark.sql("INSERT INTO gcat.db.hard VALUES (1,'a'), (2,'bb')")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM gcat.db.hard WHERE length(v) > 1")
    }
    assert(e.getMessage.contains("DELETE") ||
      e.getMessage.toLowerCase.contains("delete"))
    assert(spark.sql("SELECT count(*) FROM gcat.db.hard").head.getLong(0) == 2)
  }
}
