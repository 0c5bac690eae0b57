package graft.queries

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.{GraftTestBase, Tables}

/** SQL dialect surface, part 2: Spark 4 select-list/order-by sugar and
  * the physical-layout clauses (DISTRIBUTE BY / SORT BY / CLUSTER BY)
  * that map straight onto partitioning at scale. */
class SqlSurfaceSpec2 extends GraftTestBase {

  private def reg(): Unit = Tables(spark, sf001).registerAll()

  private def unwrap(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }

  test("ORDER BY ALL orders by every select-list column left-to-right") {
    reg()
    val got = spark.sql(
      """SELECT n_regionkey, n_name FROM nation ORDER BY ALL""")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val want = spark.sql(
      """SELECT n_regionkey, n_name FROM nation
         ORDER BY n_regionkey, n_name""")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("SELECT * EXCEPT drops named columns, keeps declaration order") {
    reg()
    val cols = spark.sql(
      "SELECT * EXCEPT (o_orderstatus, o_orderpriority) FROM orders").columns
    assert(cols.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"))
  }

  test("TABLESAMPLE ... REPEATABLE is deterministic across runs") {
    reg()
    def ids() = spark.sql(
      """SELECT o_orderkey FROM orders
         TABLESAMPLE (10 PERCENT) REPEATABLE (42)""")
      .collect().map(_.getLong(0)).toSet
    val a = ids(); val b = ids()
    assert(a == b)
    val n = Tables(spark, sf001).orders.count()
    // Bernoulli sampling: loose two-sided bound around 10%
    assert(a.size > n * 0.04 && a.size < n * 0.2,
      s"sample=${a.size} of $n")
  }

  test("DISTRIBUTE BY hash-partitions, SORT BY sorts only within partitions") {
    reg()
    val df = spark.sql(
      """SELECT o_custkey, o_totalprice FROM orders
         DISTRIBUTE BY o_custkey SORT BY o_totalprice""")
    val plan = unwrap(df)
    val exch = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exch.size == 1)
    assert(exch.head.outputPartitioning.toString.contains("o_custkey"))
    val sorts = plan.collect { case s: SortExec => s }
    assert(sorts.nonEmpty && sorts.forall(!_.global),
      "SORT BY must plan partition-LOCAL sorts (no global range exchange)")
  }

  test("DECLARE VARIABLE + EXECUTE IMMEDIATE parameterized dynamic SQL") {
    reg()
    spark.sql("DECLARE OR REPLACE VARIABLE region_id INT DEFAULT 2")
    val direct = spark.sql(
      "SELECT count(*) FROM nation WHERE n_regionkey = region_id")
      .head.getLong(0)
    assert(direct == 5)
    spark.sql("SET VARIABLE region_id = 3")
    // EXECUTE IMMEDIATE runs dynamic SQL with USING parameters and
    // INTO a session variable
    spark.sql("DECLARE OR REPLACE VARIABLE n_out BIGINT")
    spark.sql(
      """EXECUTE IMMEDIATE
         'SELECT count(*) FROM nation WHERE n_regionkey = ?'
         INTO n_out USING region_id""")
    assert(spark.sql("SELECT n_out").head.getLong(0) == 5)
  }

  test("CLUSTER BY = DISTRIBUTE BY + local SORT BY on the same keys") {
    reg()
    val df = spark.sql(
      "SELECT o_custkey, o_totalprice FROM orders CLUSTER BY o_custkey")
    val plan = unwrap(df)
    val exch = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exch.size == 1 &&
      exch.head.outputPartitioning.toString.contains("o_custkey"))
    val sorts = plan.collect { case s: SortExec => s }
    assert(sorts.nonEmpty && sorts.forall(s =>
      !s.global && s.sortOrder.head.child.toString.contains("o_custkey")))
  }
}
