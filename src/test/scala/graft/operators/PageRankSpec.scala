package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class PageRankSpec extends GraftTestBase {

  test("hand-checkable 3-node graph") {
    import spark.implicits._
    // a -> b, a -> c, b -> c, c -> a
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val r1 = PageRank.run(e, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // pr1(a) = .15 + .85*(pr0(c)/1) = 1.0
    // pr1(b) = .15 + .85*(pr0(a)/2) = 0.575
    // pr1(c) = .15 + .85*(pr0(a)/2 + pr0(b)/1) = 1.425
    assert(math.abs(r1("a") - 1.0) < 1e-12)
    assert(math.abs(r1("b") - 0.575) < 1e-12)
    assert(math.abs(r1("c") - 1.425) < 1e-12)
  }

  test("mass is conserved when every node has out-edges") {
    import spark.implicits._
    val n = 20
    val e = (0 until n).flatMap(i =>
      Seq((i, (i + 1) % n), (i, (i + 7) % n))).toDF("src", "dst")
    val ranks = PageRank.run(e, iters = 8)
    val total = ranks.agg(sum("rank")).head.getDouble(0)
    // Σ pr = n(1-d) + d·Σ pr_prev = n at the fixed point (no dangling mass)
    assert(math.abs(total - n) < 1e-9, s"mass drifted: $total vs $n")
    // ring+chord is vertex-transitive: every node must converge equal
    val (mn, mx) = (ranks.agg(min("rank")).head.getDouble(0),
                    ranks.agg(max("rank")).head.getDouble(0))
    assert(mx - mn < 1e-9)
  }
}
