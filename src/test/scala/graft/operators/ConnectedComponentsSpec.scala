package graft.operators

import graft.GraftTestBase

class ConnectedComponentsSpec extends GraftTestBase {
  import spark.implicits._

  test("transitive chains, cycles, and disjoint pairs resolve to min-id components") {
    // chain 1-2-3, pair 10-11, cycle 20-21-22: endpoints that never
    // share an edge (1 and 3) must still land in one component
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("a", "b")
    val cc = ConnectedComponents.components(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                     10L -> 10L, 11L -> 10L,
                     20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("empty edge set returns an empty labeling (no NPE from the sum check)") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.components(edges, "a", "b").count() == 0)
  }

  test("a long path needs multiple propagation rounds and still converges") {
    val n = 40 // diameter 40 path: well past one or two join rounds
    val edges = (0L until n).map(i => (i, i + 1)).toDF("a", "b")
    val cc = ConnectedComponents.components(edges, "a", "b", maxIters = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length.toLong == n + 1 && cc.forall(_._2 == 0L))
  }
}
