package graft.quality

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** df.stat surface: freqItems (heavy hitters, Karp-style one-pass) and
  * sampleBy (stratified sampling with per-stratum fractions). Both are
  * single-pass distributed primitives: freqItems keeps a fixed 1/support
  * -sized map per partition (the guarantee is a SUPERSET of the true
  * frequent items); sampleBy is seeded map-side Bernoulli per stratum. */
class StatFunctionsSpec extends GraftTestBase {

  test("freqItems returns a superset of the truly frequent values") {
    val li = Tables(spark, sf001)("lineitem")
    val support = 0.2
    val got = li.stat.freqItems(Array("l_returnflag"), support)
      .collect().head.getSeq[String](0).toSet
    val truth = li.groupBy("l_returnflag").count()
      .filter(col("count") > lit(support) * li.count())
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(got),
      s"missed frequent items: ${truth -- got} (got $got)")
  }

  test("sampleBy hits per-stratum fractions and is seed-deterministic") {
    val orders = Tables(spark, sf001)("orders")
    val fractions = Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.1)
    val s1 = orders.stat.sampleBy("o_orderpriority", fractions, seed = 42L)
    val s2 = orders.stat.sampleBy("o_orderpriority", fractions, seed = 42L)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty,
      "same seed produced different samples")
    // only requested strata appear
    val strata = s1.select("o_orderpriority").distinct()
      .collect().map(_.getString(0)).toSet
    assert(strata.subsetOf(fractions.keySet))
    // sampled counts within a loose binomial window of the target
    val per = s1.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (k, f) =>
      val (n, expect) = (per.getOrElse(k, 0L).toDouble, base(k) * f)
      assert(math.abs(n - expect) < 4 * math.sqrt(base(k) * f * (1 - f)) + 1,
        s"stratum $k: sampled $n, expected ~$expect")
    }
  }
}
