package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous weighted label propagation (community detection) over
  * an edge DataFrame (src, dst, w) — the fourth member of the
  * iterative-graph family (PageRank, ConnectedComponents, KMeans share
  * the loop shape).
  *
  * Labels start as the node id; each iteration every node adopts the
  * label carrying the highest total edge weight among its neighbors,
  * ties to the smallest label — fully integer logic, so a fixed
  * iteration count is deterministic and oracle-able as an unrolled CTE
  * chain. Edges are symmetrized (undirected) and self-loops dropped;
  * isolated nodes keep their own label. Known synchronous-LP artifact:
  * a symmetric bipartite component (e.g. a bare pair) swaps labels
  * every round and never converges — triangles damp this in real
  * graphs; an async/semi-sync variant is the fix if it ever matters.
  *
  * Scale shape: per iteration one join (labels ⋈ edges on dst) + one
  * (src, label) aggregate + one top-1 window — all hash-partitioned on
  * node keys; the big static edge table keeps its partitioning across
  * iterations while only the (node, label) vector moves (the PageRank
  * argument, PageRank.scala:20-24). Long loops at scale would
  * localCheckpoint every ~10 iterations to cut lineage.
  *
  * Reference scope: the capstone has no graph operators — extension
  * surface (SURVEY.md §8).
  */
object LabelPropagation {

  /** Communities after `iters` synchronous rounds. Returns
    * (node, label).
    *
    * `checkpointEvery` > 0 localCheckpoints the label vector on that
    * cadence, so a deep loop's unrolled plan — and any recompute of
    * it — stays bounded regardless of iteration count (the
    * PageRank.checkpointEvery argument). Values are unchanged either
    * way — LabelPropagationSpec pins the two forms equal — so the
    * oracled+benched q291 runs the checkpointed form (the unrolled plan
    * is the one that collapses under memory pressure; r6 driver bench
    * 25.9 s vs 2.5 s quiesced) while its unrolled-CTE oracle still
    * matches value-for-value. NOTE: checkpointEvery > 0 makes the call
    * EAGER at the checkpoint boundaries (Spark jobs run inside this
    * call), and localCheckpointed blocks don't survive executor loss —
    * the PageRank.run contract. */
  def run(edges: DataFrame, iters: Int, checkpointEvery: Int = 0): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .filter(col("src") =!= col("dst"))
    // materialize the static symmetrized edge table ONCE (localCheckpoint
    // caches partitions and cuts lineage) — otherwise every iteration's
    // broadcast of the label vector re-evaluates the upstream edge
    // derivation (often an expensive multi-join) from scratch
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct()

    var labels = nodes.withColumn("label", col("node"))
    for (it <- 1 to iters) {
      // the (node, label) vector is the small moving side — broadcast
      // it against the static edge table so iterations never reshuffle
      // the edges (at 100 TB ranks stay MBs while edges are the bulk)
      val scored = sym
        .join(broadcast(labels.withColumnRenamed("node", "dst")), "dst")
        .groupBy(col("src"), col("label"))
        .agg(sum("w").as("wt"))
      val pick = Window.partitionBy("src")
        .orderBy(col("wt").desc, col("label").asc)
      val next = scored
        .withColumn("rn", row_number().over(pick))
        .filter(col("rn") === 1)
        .select(col("src").as("node"), col("label"))
      // isolated nodes (no neighbors) keep their current label
      labels = labels.select(col("node"), col("label").as("prev"))
        .join(next.withColumnRenamed("label", "nxt"), Seq("node"), "left")
        .select(col("node"), coalesce(col("nxt"), col("prev")).as("label"))
      if (checkpointEvery > 0 && it % checkpointEvery == 0 && it < iters)
        labels = labels.localCheckpoint()
    }
    labels
  }
}
