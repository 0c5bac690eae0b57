package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

class LouvainSpec extends GraftTestBase {

  /** q429's symmetrized nation trade graph at sf0.001. */
  private def tradeEdges = {
    val t = Tables(spark, sf001)
    val e0 = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("i"), col("s_nationkey").as("j"))
      .agg(count(lit(1)).as("c"))
    e0.select(col("i"), col("j"), col("c"))
      .union(e0.select(col("j"), col("i"), col("c")))
      .groupBy("i", "j").agg(sum("c").as("w"))
  }

  test("planted two-community graph is recovered exactly") {
    import spark.implicits._
    // two 4-cliques (weight 10 inside) joined by one weight-1 bridge
    val inA = for { a <- 0 to 3; b <- 0 to 3 if a != b } yield (a.toLong, b.toLong, 10L)
    val inB = for { a <- 4 to 7; b <- 4 to 7 if a != b } yield (a.toLong, b.toLong, 10L)
    val bridge = Seq((3L, 4L, 1L), (4L, 3L, 1L))
    val edges = (inA ++ inB ++ bridge).toDF("i", "j", "w")
    val comm = Louvain.cluster(edges, "i", "j", "w", rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).map(comm).toSet.size == 1, s"cluster A split: $comm")
    assert((4L to 7L).map(comm).toSet.size == 1, s"cluster B split: $comm")
    assert(comm(0L) != comm(4L), s"clusters merged: $comm")
  }

  test("phase-2 contraction never lowers Q (projected-modularity invariant)") {
    val edges = tradeEdges.localCheckpoint()
    val q1 = Louvain.modularity(edges, "i", "j", "w",
      Louvain.cluster(edges, "i", "j", "w", rounds = 8))
    val q2 = Louvain.modularity(edges, "i", "j", "w",
      Louvain.clusterLevels(edges, "i", "j", "w", rounds = 8, levels = 2))
    info(f"levels=1 Q=$q1%.4f levels=2 Q=$q2%.4f")
    assert(q2 >= q1 - 1e-12, s"levels=2 $q2 < levels=1 $q1")
  }

  test("Q is non-decreasing per round and beats the region partition") {
    val edges = tradeEdges.localCheckpoint()
    val qs = Seq(0, 1, 2, 3, 4, 6, 8, 12).map { r =>
      r -> Louvain.modularity(edges, "i", "j", "w",
        Louvain.cluster(edges, "i", "j", "w", r))
    }
    info(qs.map { case (r, q) => f"r$r=$q%.4f" }.mkString(" "))
    qs.sliding(2).foreach {
      case Seq((_, q1), (r, q2)) =>
        assert(q2 >= q1 - 1e-12, s"round $r decreased Q: $q2 < $q1")
      case _ =>
    }
    val t = Tables(spark, sf001)
    val reg = t("nation")
      .select(col("n_nationkey").as("id"),
        col("n_regionkey").cast("long").as("community"))
    val qReg = Louvain.modularity(edges, "i", "j", "w", reg)
    info(f"region partition Q=$qReg%.4f vs louvain ${qs.last._2}%.4f")
    assert(qs.last._2 > qReg,
      s"louvain ${qs.last._2} did not beat region $qReg")
  }
}
