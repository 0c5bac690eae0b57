package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class HitsSpec extends GraftTestBase {

  test("hand-checkable 3-node graph, one iteration") {
    import spark.implicits._
    // a -> b, a -> c, b -> c
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val r = Hits.run(e, iters = 1).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // auth raw: a=0, b=hub0(a)=1, c=hub0(a)+hub0(b)=2 → /2 → (0, .5, 1)
    // hub raw:  a=auth(b)+auth(c)=1.5, b=auth(c)=1, c=0 → /1.5 → (1, 2/3, 0)
    assert(math.abs(r("a")._1 - 0.0) < 1e-12)
    assert(math.abs(r("b")._1 - 0.5) < 1e-12)
    assert(math.abs(r("c")._1 - 1.0) < 1e-12)
    assert(math.abs(r("a")._2 - 1.0) < 1e-12)
    assert(math.abs(r("b")._2 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r("c")._2 - 0.0) < 1e-12)
  }

  test("matches a driver-side reference on a pseudo-random graph") {
    import spark.implicits._
    // deterministic 12-node edge set (md5-free LCG so the spec is fixed)
    var seed = 12345L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val edges = (0 until 40).map { _ =>
      (math.floorMod(next(), 12).toInt, math.floorMod(next(), 12).toInt)
    }.distinct.filter { case (s, d) => s != d }
    val iters = 4

    // reference: dense arrays, same L∞ normalization
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    var auth = Array.fill(nodes.size)(1.0)
    var hub = Array.fill(nodes.size)(1.0)
    for (_ <- 1 to iters) {
      val a2 = Array.fill(nodes.size)(0.0)
      for ((s, d) <- edges) a2(idx(d)) += hub(idx(s))
      val amax = a2.max
      auth = a2.map(_ / amax)
      val h2 = Array.fill(nodes.size)(0.0)
      for ((s, d) <- edges) h2(idx(s)) += auth(idx(d))
      val hmax = h2.max
      hub = h2.map(_ / hmax)
    }

    val got = Hits.run(edges.toDF("src", "dst"), iters).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == nodes.toSet)
    for (n <- nodes) {
      assert(math.abs(got(n)._1 - auth(idx(n))) < 1e-9, s"auth($n)")
      assert(math.abs(got(n)._2 - hub(idx(n))) < 1e-9, s"hub($n)")
    }
    // L∞ normalization: the top authority and top hub are exactly 1.0
    assert(got.values.map(_._1).max == 1.0)
    assert(got.values.map(_._2).max == 1.0)

    // the driver-local path (schema-bounded graphs) agrees with the
    // distributed loop to float summation order
    val local = Hits.run(edges.toDF("src", "dst"), iters,
        localThreshold = 10000L).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(local.keySet == got.keySet)
    for (n <- nodes) {
      assert(math.abs(local(n)._1 - got(n)._1) < 1e-9, s"local auth($n)")
      assert(math.abs(local(n)._2 - got(n)._2) < 1e-9, s"local hub($n)")
    }
  }

  test("localThreshold smaller than the edge count falls through to distributed") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val r = Hits.run(e, iters = 1, localThreshold = 2L).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(r("b")._1 - 0.5) < 1e-12)
    assert(math.abs(r("a")._2 - 1.0) < 1e-12)
  }
}
