package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random walks over an edge DataFrame (src, dst) — the
  * sampling pass that feeds skip-gram graph embeddings (DeepWalk /
  * node2vec): one fixed-length walk per start node, where step k moves
  * to the out-neighbor minimizing a salted md5-uniform draw over
  * (current node, k, neighbor).
  *
  * Hash-argmin in place of a true random choice is the same trick the
  * sampler family uses (q76/q289): every engine that can compute md5
  * replays the exact walk, so the oracle pins each hop bit-for-bit,
  * and re-running the job on different partitionings yields identical
  * walks. The draw conditions on the STEP INDEX, so a walk revisiting
  * a node does not loop deterministically forever.
  *
  * Scale shape: step k is one join of the walk frontier (one row per
  * start node) against the static edge table on the current node — at
  * 100 TB both sides hash-partition on the join key and the edge side's
  * partitioning is reused across steps (same loop shape as PageRank) —
  * followed by a per-start row_number over the candidate neighbors,
  * which rides WindowGroupLimit pushdown (rank 1 prunes per-partition
  * before the exchange). Walk state is localCheckpointed per step:
  * each iteration's frontier feeds the next join once, but the cut
  * keeps analysis time linear in walk length. Dead ends (no
  * out-neighbor) pad the remaining hops with NULL rather than dropping
  * the walk, so the output is always one row per start node.
  *
  * Contract: EAGER like [[PageRank.run]] / [[Hits.run]] — the
  * localCheckpoint cadence runs jobs at call time.
  *
  * Reference scope: graph-family extension (SURVEY.md §7.4), alongside
  * PageRank / label propagation / components / triangles / HITS.
  */
object RandomWalk {

  /** One walk of `steps` hops from every distinct node. Returns
    * (start, s1, ..., s&lt;steps&gt;), hop columns nullable on dead ends. */
  def walks(edges: DataFrame, steps: Int, salt: String): DataFrame = {
    require(steps >= 1, "walks need at least one step")
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    var w = nodes.select(col("node").as("start"), col("node").as("cur"))
    for (k <- 1 to steps) {
      // draw: u = md5Uniform("cur|k|dst"); min (u, dst) wins. A null
      // cur (dead walk) joins nothing and carries a single null dst
      // row, so its ordering never matters.
      val cand = w.join(e, w("cur") === e("src"), "left")
        .withColumn("u", Anonymize.md5Uniform(
          concat_ws("|", col("cur"), lit(k), col("dst")), salt))
      val win = Window.partitionBy("start")
        .orderBy(col("u").asc_nulls_last, col("dst").asc_nulls_last)
      val hops = (1 until k).map(i => col(s"s$i"))
      w = cand.withColumn("r", row_number().over(win))
        .filter(col("r") === 1)
        .select(col("start") +: hops :+ col("dst").as(s"s$k"): _*)
        .withColumn("cur", col(s"s$k"))
        .localCheckpoint()
    }
    val out = w.drop("cur")
    e.unpersist()
    out
  }
}
