package graft.sources

import org.scalatest.BeforeAndAfterAll

import graft.GraftTestBase

/** CHECK table constraints through the DSv2 catalog (Spark 4.1):
  * declared at CREATE or via ALTER TABLE ADD CONSTRAINT, persisted in
  * catalog metadata, and — when ENFORCED — validated by Spark on every
  * INSERT (the write plan carries a CheckInvariant guard; a violating
  * row fails the write instead of corrupting the table). */
class GraftCatalogConstraintsSpec extends GraftTestBase
    with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
  }

  test("ENFORCED CHECK rejects violating inserts, admits valid ones") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.con")
    spark.sql(
      """CREATE TABLE gcat.db.con (
           k INT, v INT,
           CONSTRAINT v_pos CHECK (v > 0) ENFORCED)""")
    spark.sql("INSERT INTO gcat.db.con VALUES (1, 10), (2, 20)")
    val boom = intercept[Exception] {
      spark.sql("INSERT INTO gcat.db.con VALUES (3, -1)")
    }
    assert(boom.getMessage.toLowerCase.contains("check")
      || boom.getMessage.contains("v_pos"), boom.getMessage)
    // the failed insert left the table untouched (atomic commit)
    val got = spark.sql("SELECT k FROM gcat.db.con ORDER BY k")
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(1, 2))
  }

  test("ALTER TABLE ADD CONSTRAINT enforces from then on; DROP lifts it") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.con2")
    spark.sql("CREATE TABLE gcat.db.con2 (k INT, v INT)")
    spark.sql("INSERT INTO gcat.db.con2 VALUES (1, -5)") // fine pre-constraint
    spark.sql(
      "ALTER TABLE gcat.db.con2 ADD CONSTRAINT v_cap CHECK (v < 100)")
    val boom = intercept[Exception] {
      spark.sql("INSERT INTO gcat.db.con2 VALUES (3, 900)")
    }
    assert(boom.getMessage.toLowerCase.contains("check")
      || boom.getMessage.contains("v_cap"), boom.getMessage)
    spark.sql("INSERT INTO gcat.db.con2 VALUES (4, 50)")
    // DROP lifts the guard: the previously-rejected row now inserts
    spark.sql("ALTER TABLE gcat.db.con2 DROP CONSTRAINT v_cap")
    spark.sql("INSERT INTO gcat.db.con2 VALUES (5, 900)")
    assert(spark.sql("SELECT count(*) FROM gcat.db.con2").head.getLong(0)
      == 3)
  }

  test("constraints survive in metadata and show in DESCRIBE") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.con3")
    spark.sql(
      """CREATE TABLE gcat.db.con3 (
           k INT, CONSTRAINT k_pos CHECK (k > 0) ENFORCED)""")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED gcat.db.con3")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("k_pos"), desc)
  }
}
