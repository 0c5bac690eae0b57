package graft.sources

import org.apache.spark.sql.AnalysisException
import org.scalatest.BeforeAndAfterAll

import graft.GraftTestBase

/** DSv2 FunctionCatalog: catalog-resolved SQL functions — bind-time
  * overload resolution, the scalar `invoke` magic-method path, and a
  * V2 aggregate with map-side partial aggregation. */
class GraftFunctionCatalogSpec extends GraftTestBase with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
  }

  test("scalar function resolves through the catalog and computes") {
    val r = spark.sql("SELECT gcat.system.cents(12.345d) AS c").head
    assert(r.getLong(0) == 1235L)
    // half-cent boundary rounds up (floor(x*100 + 0.5))
    assert(spark.sql("SELECT gcat.system.cents(0.005d) AS c")
      .head.getLong(0) == 1L)
  }

  test("catalog scalar matches the built-in expression over a real table") {
    graft.Tables(spark, sf001).registerAll()
    val mismatches = spark.sql(
      """SELECT count(*) AS bad FROM lineitem
         WHERE gcat.system.cents(l_extendedprice)
               <> CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)""")
      .head.getLong(0)
    assert(mismatches == 0L)
  }

  test("overload binding picks the implementation by argument types") {
    val longs = spark.sql(
      "SELECT gcat.system.clamp(9L, 1L, 5L) AS a, gcat.system.clamp(-3L, 1L, 5L) AS b")
      .head
    assert(longs.getLong(0) == 5L && longs.getLong(1) == 1L)
    val doubles = spark.sql(
      "SELECT gcat.system.clamp(2.5d, 0.0d, 1.0d) AS a").head
    assert(doubles.getDouble(0) == 1.0)
  }

  test("arity and type errors surface at analysis time, not runtime") {
    val wrongArity = intercept[AnalysisException] {
      spark.sql("SELECT gcat.system.cents(1.0d, 2.0d)").collect()
    }
    assert(wrongArity.getMessage.contains("1 argument"))
    val wrongType = intercept[AnalysisException] {
      spark.sql("SELECT gcat.system.clamp(1L, 2.0d, 3L)").collect()
    }
    assert(wrongType.getMessage.toLowerCase.contains("clamp"))
  }

  test("V2 aggregate sums exact cents with partial aggregation") {
    graft.Tables(spark, sf001).registerAll()
    val df = spark.sql(
      """SELECT l_returnflag,
                gcat.system.cents_sum(l_extendedprice) AS total
         FROM lineitem GROUP BY 1 ORDER BY 1""")
    // partial (map-side) aggregation engaged: two HashAggregate levels
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
    val expected = spark.sql(
      """SELECT l_returnflag,
                sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  / 100 AS total
         FROM lineitem GROUP BY 1 ORDER BY 1""")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == expected.toSeq)
  }

  test("aggregate merge is exact under repartitioning") {
    graft.Tables(spark, sf001).registerAll()
    val one = spark.sql(
      "SELECT gcat.system.cents_sum(l_extendedprice) AS t FROM lineitem")
      .head.getDouble(0)
    val shuffled = graft.Tables(spark, sf001)("lineitem")
      .repartition(17).createOrReplaceTempView("lineitem_17")
    val many = spark.sql(
      "SELECT gcat.system.cents_sum(l_extendedprice) AS t FROM lineitem_17")
      .head.getDouble(0)
    assert(one == many)
  }

  test("SHOW FUNCTIONS lists the catalog functions") {
    val fns = spark.sql("SHOW FUNCTIONS IN gcat.system")
      .collect().map(_.getString(0).toLowerCase)
    assert(fns.exists(_.endsWith("cents")))
    assert(fns.exists(_.endsWith("cents_sum")))
    assert(fns.exists(_.endsWith("clamp")))
  }
}
