package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge DataFrame (src, dst) — the
  * iterative-dataflow pattern (the same loop shape as KMeans and
  * ConnectedComponents, over a graph).
  *
  * Simplified formulation (no dangling-mass redistribution, matching
  * the fixed-iteration oracle exactly):
  *
  *   pr_0(n)     = 1.0
  *   pr_{k+1}(n) = (1 - d) + d * Σ_{m→n} pr_k(m) / outdeg(m)
  *
  * Each iteration is one join (ranks ⋈ edges on src) + one groupBy(dst)
  * — at scale both hash-partition on the same keys, and the edge table
  * (the big, static side) keeps a stable partitioning across
  * iterations so only the small rank vector moves. Iterations are a
  * fixed unrolled count: deterministic, oracle-able, and the plan stays
  * bounded (each loop iteration re-derives from the previous DataFrame;
  * for 100+ iterations at scale, localCheckpoint every ~10 cuts lineage).
  *
  * Reference scope: the capstone has no graph/iterative operators at
  * all — this extends the engine the same way ConnectedComponents does
  * (SURVEY.md §7.4 extensions).
  */
object PageRank {

  /** Ranks after `iters` iterations. Nodes = every distinct src or dst.
    * Returns (node, rank). */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))

    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(e, ranks("node") === e("src"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
    }
    ranks
  }
}
