package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Salting and bucketing: results must match the unsalted/unbucketed
  * plans, and the bucketed join must actually drop its exchanges. */
class ScaleOpsSpec extends GraftTestBase {
  import spark.implicits._

  test("salted inner join equals plain join (incl. a 90%-skewed key)") {
    val probe = ((1 to 900).map(i => (7L, s"v$i")) ++ (1 to 100).map(i => (i.toLong % 5, s"w$i")))
      .toDF("k", "payload")
    val build = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("bk", "name")
    val plain = probe.join(build, $"k" === $"bk")
      .select("k", "payload", "name").collect().map(_.toString).sorted
    val salted = Salting.saltedInnerJoin(probe, "k", build, "bk",
        saltFactor = 8, saltSource = Seq("payload"))
      .select("k", "payload", "name").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = graft.Tables(spark, sf001)("lineitem")
    val direct = df.groupBy($"l_suppkey".as("k"))
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum"))
      .orderBy("k").collect().map(_.toString)
    val salted = Salting.saltedCountSum(df.withColumnRenamed("l_suppkey", "k"),
        "k", "l_quantity", saltFactor = 16, saltSource = Seq("l_orderkey"))
      .orderBy("k").collect().map(_.toString)
    assert(salted.toSeq == direct.toSeq)
  }

  test("bloom-pruned join equals plain join and actually prunes the probe side") {
    val lineitem = graft.Tables(spark, sf001)("lineitem")
    // selective build side: 10% of suppliers
    val build = graft.Tables(spark, sf001)("supplier")
      .filter($"s_suppkey" % 10 === 0)
      .select($"s_suppkey", $"s_name")
    val plain = lineitem.join(build, $"l_suppkey" === $"s_suppkey")
      .select("l_orderkey", "l_linenumber", "s_name")
      .collect().map(_.toString).sorted
    val bloomed = BloomJoin.bloomPrunedJoin(lineitem, build,
        "l_suppkey", "s_suppkey", expectedItems = 1000)
      .select("l_orderkey", "l_linenumber", "s_name")
      .collect().map(_.toString).sorted
    assert(bloomed.toSeq == plain.toSeq)

    // the filter itself must drop (most of) the 90% non-matching rows
    val bf = build.stat.bloomFilter("s_suppkey", 1000, 0.01)
    val kept = BloomJoin.prune(lineitem, "l_suppkey", bf).count()
    val total = lineitem.count()
    assert(kept < total * 0.2, s"bloom kept $kept of $total — no pruning happened")
  }

  test("bucketed join plans without a shuffle exchange and matches plain join") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val orders   = graft.Tables(spark, sf001)("orders")
    val customer = graft.Tables(spark, sf001)("customer")
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", buckets = 8)
    Bucketing.writeBucketed(customer, "b_customer", "c_custkey", buckets = 8)

    // Force the shuffle-join path: with broadcast allowed the planner
    // just broadcasts the small side and ignores buckets. The point of
    // bucketing is the BIG-big join, where co-partitioning must replace
    // both exchanges.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "o_custkey",
                                          "b_customer", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")

      val got = joined.select("o_orderkey", "c_name").collect().map(_.toString).sorted
      val want = orders.join(customer, $"o_custkey" === $"c_custkey")
        .select("o_orderkey", "c_name").collect().map(_.toString).sorted
      assert(got.toSeq == want.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
