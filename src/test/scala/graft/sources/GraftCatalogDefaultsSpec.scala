package graft.sources

import org.scalatest.BeforeAndAfterAll

import graft.GraftTestBase

/** Column DEFAULT values through the DSv2 catalog: declared at CREATE,
  * applied by the analyzer when INSERTs omit the column, changeable via
  * ALTER COLUMN, and explicitly addressable with the DEFAULT keyword. */
class GraftCatalogDefaultsSpec extends GraftTestBase with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
  }

  test("INSERT omitting a defaulted column gets the default") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.dflt")
    spark.sql(
      """CREATE TABLE gcat.db.dflt (
           k INT,
           status STRING DEFAULT 'open',
           score DOUBLE DEFAULT 0.5)""")
    spark.sql("INSERT INTO gcat.db.dflt (k) VALUES (1), (2)")
    spark.sql("INSERT INTO gcat.db.dflt VALUES (3, 'closed', 0.9)")
    val got = spark.sql(
      "SELECT k, status, score FROM gcat.db.dflt ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1, "open", 0.5), (2, "open", 0.5),
      (3, "closed", 0.9)))
  }

  test("explicit DEFAULT keyword in VALUES resolves the declared default") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.dflt2")
    spark.sql(
      "CREATE TABLE gcat.db.dflt2 (k INT, v STRING DEFAULT 'none')")
    spark.sql("INSERT INTO gcat.db.dflt2 VALUES (1, DEFAULT), (2, 'x')")
    val got = spark.sql("SELECT k, v FROM gcat.db.dflt2 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "none"), (2, "x")))
  }

  test("non-literal (foldable) default expressions evaluate at analysis") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.dflt3")
    spark.sql(
      "CREATE TABLE gcat.db.dflt3 (k INT, hundred INT DEFAULT 10 * 10)")
    spark.sql("INSERT INTO gcat.db.dflt3 (k) VALUES (7)")
    assert(spark.sql("SELECT hundred FROM gcat.db.dflt3").head.getInt(0)
      == 100)
  }

  test("ALTER COLUMN SET DEFAULT changes only FUTURE inserts") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.dflt4")
    spark.sql(
      "CREATE TABLE gcat.db.dflt4 (k INT, tag STRING DEFAULT 'v1')")
    spark.sql("INSERT INTO gcat.db.dflt4 (k) VALUES (1)")
    spark.sql(
      "ALTER TABLE gcat.db.dflt4 ALTER COLUMN tag SET DEFAULT 'v2'")
    spark.sql("INSERT INTO gcat.db.dflt4 (k) VALUES (2)")
    val got = spark.sql("SELECT k, tag FROM gcat.db.dflt4 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "v1"), (2, "v2")))
  }

  test("ALTER COLUMN DROP DEFAULT reverts omitted columns to NULL") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.dflt5")
    spark.sql(
      "CREATE TABLE gcat.db.dflt5 (k INT, tag STRING DEFAULT 'set')")
    spark.sql("ALTER TABLE gcat.db.dflt5 ALTER COLUMN tag DROP DEFAULT")
    spark.sql("INSERT INTO gcat.db.dflt5 (k) VALUES (1)")
    val r = spark.sql("SELECT tag FROM gcat.db.dflt5").head
    assert(r.isNullAt(0))
  }
}
