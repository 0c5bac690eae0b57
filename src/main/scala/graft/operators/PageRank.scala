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
  * iterations so only the small rank vector moves. The static frames
  * (deduped edges, node set, out-degrees) are cached ONCE — without
  * that, every iteration's plan re-derives `distinct()` and the degree
  * aggregate from raw edges, and the unrolled lineage makes iteration k
  * cost O(k) recomputes (quadratic overall). Ranks are localCheckpointed
  * every [[checkpointEvery]] iterations: the plan is cut to a
  * materialized RDD, keeping analysis/codegen time and any recompute
  * bounded regardless of iteration count. Values are unchanged —
  * checkpointing only truncates lineage.
  *
  * Reference scope: the capstone has no graph/iterative operators at
  * all — this extends the engine the same way ConnectedComponents does
  * (SURVEY.md §7.4 extensions).
  */
object PageRank {

  /** Lineage-cut cadence: deep enough to amortize the materialization,
    * shallow enough that Catalyst never sees a 10-join-deep plan. */
  private val checkpointEvery = 5

  /** Ranks after `iters` iterations. Nodes = every distinct src or dst.
    * Returns (node, rank).
    *
    * Contract: this call is EAGER — the cache + localCheckpoint cadence
    * (and the final localCheckpoint that lets the cached inputs be
    * released) run Spark jobs at call time, so `run` returns a
    * materialized result, not a lazy plan. localCheckpoint trades fault
    * tolerance for speed: the checkpointed blocks live on executor
    * storage, so losing an executor mid-/post-run loses them and the
    * computation must be re-run from the source (acceptable for an
    * iterative fit; use reliable `checkpoint()` to a checkpoint dir if
    * the result must survive executor failure). Plan-only callers (e.g.
    * plan-shape inspection) should build their own loop without the
    * checkpoint cadence. */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()

    var ranks = nodes.withColumn("rank", lit(1.0))
    for (it <- 1 to iters) {
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
      if (it % checkpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint()
    }
    // Materialize the final ranks so the cached inputs can be released
    // without handing the caller a plan that would recompute them.
    val out = ranks.localCheckpoint()
    e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    out
  }

  /** PERSONALIZED PageRank (Haveliwala 2002; the seed-propagation move
    * behind link-graph quality scoring à la "trusted seeds" curation):
    * the teleport mass lands only on the `seeds` set —
    *
    *   pr_0(n)     = tp(n)
    *   pr_{k+1}(n) = (1−d)·tp(n) + d·Σ_{m→n} pr_k(m)/outdeg(m)
    *
    * with tp(n) = 1/|S| on seeds, 0 elsewhere — so rank measures
    * proximity to the seed set, not global centrality. Same loop
    * shape, cadence, and eager contract as [[run]]; the single driver
    * scalar is |S| (the seed list is caller-curated and bounded by
    * definition). Returns (node, rank).
    */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                   damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()
    // teleport mass 1/|S| over seeds IN THE GRAPH: a seed absent from
    // the edge-derived node set would be dropped by the tp join below,
    // silently shrinking total teleport mass under 1 — intersect first
    // so out-of-graph seeds are ignored rather than diluting
    val sd = seeds.select(col("node")).distinct()
      .join(nodes, Seq("node"), "left_semi").cache()
    val nSeeds = sd.count()
    require(nSeeds > 0,
      "personalized PageRank needs a non-empty in-graph seed set")
    val tp = nodes.join(sd.withColumn("__s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("__s").isNotNull, lit(1.0 / nSeeds)).otherwise(lit(0.0))
          .as("tp"))
      .localCheckpoint()

    var ranks = tp.select(col("node"), col("tp").as("rank"))
    for (it <- 1 to iters) {
      val contribs = ranks
        .join(e, ranks("node") === e("src"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      ranks = tp
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("tp") +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
      if (it % checkpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint()
    }
    val out = ranks.localCheckpoint()
    e.unpersist(); nodes.unpersist(); outdeg.unpersist(); sd.unpersist()
    out
  }

  /** WEIGHTED PageRank over (src, dst, weight): mass flows along each
    * edge in proportion to its weight share of the source's total
    * out-weight — pr_{k+1}(n) = (1−d) + d·Σ_{m→n} pr_k(m)·w(m,n)/W(m).
    * Same loop shape and eager/localCheckpoint contract as [[run]];
    * duplicate (src, dst) rows are weight-summed first so the edge
    * relation stays one row per edge. Weight shares are exact-integer
    * ratios when weights are counts, so an unrolled SQL oracle replays
    * the ranks bit-for-bit under the same rounding. */
  def runWeighted(edges: DataFrame, iters: Int,
                  damping: Double = 0.85): DataFrame = {
    val e = edges.groupBy("src", "dst")
      .agg(sum(col("weight")).as("w")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val outw = e.groupBy("src").agg(sum("w").as("tw")).cache()

    var ranks = nodes.withColumn("rank", lit(1.0))
    for (it <- 1 to iters) {
      val contribs = ranks
        .join(e, ranks("node") === e("src"))
        .join(outw, "src")
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("tw")).as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
      if (it % checkpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint()
    }
    val out = ranks.localCheckpoint()
    e.unpersist(); nodes.unpersist(); outw.unpersist()
    out
  }
}
