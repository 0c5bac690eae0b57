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

  test("scalar magic method plans as StaticInvoke and survives codegen") {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    graft.Tables(spark, sf001).registerAll()
    val df = spark.sql(
      """SELECT gcat.system.cents(l_extendedprice) AS c,
                gcat.system.clamp(l_quantity, 5.0d, 40.0d) AS q
         FROM lineitem""")
    // the analyzer must have taken the static magic-method path — an
    // ApplyFunctionExpression here would mean boxed interpreted calls
    val statics = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case s: StaticInvoke => s.staticObject.getName
    })
    assert(statics.exists(_.contains("GraftCentsFn")),
      s"cents should plan as StaticInvoke, got $statics")
    assert(statics.exists(_.contains("GraftClampDoubleFn")),
      s"clamp should plan as StaticInvoke, got $statics")
    // with fallback disabled, a Janino compile failure aborts the query
    // instead of silently degrading to interpreted eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = df.limit(5).collect()
      assert(r.nonEmpty && r.forall(row => row.getDouble(1) >= 5.0 && row.getDouble(1) <= 40.0))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
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
