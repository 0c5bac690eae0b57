package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hyperlink-induced topic search, Kleinberg 1999) hub/authority
  * scores over an edge DataFrame (src, dst) — the mutually-recursive
  * companion of [[PageRank]] in the iterative-dataflow family:
  *
  *   auth_k(n) = Σ_{s→n} hub_{k-1}(s)   then auth_k /= max(auth_k)
  *   hub_k(s)  = Σ_{s→d} auth_k(d)      then hub_k  /= max(hub_k)
  *
  * Normalization uses the L∞ norm (divide by the max) rather than the
  * textbook L2: max over doubles is exact regardless of aggregation
  * order, so the normalizer is bit-deterministic across partitionings
  * and engines, while an L2 norm would inject a √(Σx²) whose low bits
  * depend on float summation order. The fixed point is the same
  * principal-eigenvector direction either way — only the scale differs
  * (max-normalized scores land in [0, 1] with the top hub/authority
  * pinned at exactly 1.0).
  *
  * Scale shape: mirrors PageRank — each half-iteration is one join of
  * the small score vector against the big static edge table (both
  * hash-partitioned on the join key, edges' partitioning stable across
  * iterations) plus one groupBy; the max-normalizer is a 1-row aggregate
  * broadcast back via crossJoin, not a driver round-trip inside the
  * plan. Static frames (deduped edges, node set) are cached once; the
  * raw score vector is localCheckpointed each half-step (it feeds the
  * crossJoin TWICE — as data and as the max aggregate — so an uncut
  * lineage would re-embed the whole previous plan several times per
  * iteration and grow exponentially), keeping plan depth O(1) in the
  * iteration count.
  *
  * Contract: EAGER, like [[PageRank.run]] — the cache + localCheckpoint
  * cadence runs Spark jobs at call time and the returned frame is
  * materialized (localCheckpoint trades executor-failure tolerance for
  * speed; see PageRank.run's scaladoc). Edges must be non-empty: an
  * empty graph has no max to normalize by.
  *
  * Reference scope: the capstone has no graph operators at all — this
  * extends the engine alongside PageRank/LabelPropagation/
  * ConnectedComponents (SURVEY.md §7.4 extensions).
  */
object Hits {

  /** Hub/authority scores after `iters` full iterations.
    * Returns (node, auth, hub), one row per distinct src or dst. */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    require(!e.isEmpty,
      "Hits.run needs a non-empty edge set (no max to normalize by)")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()

    var scores = nodes.withColumn("auth", lit(1.0)).withColumn("hub", lit(1.0))
    for (_ <- 1 to iters) {
      // authority update: pull hub mass along in-edges, normalize by max.
      // The raw per-node frame is localCheckpointed BEFORE the crossJoin:
      // crossJoin(agg(max)) references the frame twice, so without the
      // cut each iteration would EMBED the previous plan ~6× over and the
      // unrolled plan would grow exponentially with the iteration count
      // (minutes of analysis time by iteration 5). Materializing the
      // node-sized vector per half-step is the standard iterative-
      // dataflow shape (same contract as PageRank's cadence).
      val aRaw = scores
        .join(e, scores("node") === e("src"))
        .groupBy(col("dst").as("node")).agg(sum("hub").as("a"))
      val a = nodes.join(aRaw, Seq("node"), "left")
        .select(col("node"), coalesce(col("a"), lit(0.0)).as("a"))
        .localCheckpoint()
      val auth = a.crossJoin(a.agg(max("a").as("amax")))
        .select(col("node"), (col("a") / col("amax")).as("auth"))
      // hub update: pull the fresh authority mass along out-edges
      val hRaw = auth
        .join(e, auth("node") === e("dst"))
        .groupBy(col("src").as("node")).agg(sum("auth").as("h"))
      val h = nodes.join(hRaw, Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0.0)).as("h"))
      val hub = h.crossJoin(h.agg(max("h").as("hmax")))
        .select(col("node"), (col("h") / col("hmax")).as("hub"))
      // One cut per iteration is enough for boundedness: hub's double
      // reference to h expands to a CONSTANT ~6 shallow leaves over the
      // materialized `a`, so plan depth stays O(1) across iterations
      // while the per-iteration job count stays at one checkpoint.
      scores = auth.join(hub, "node")
    }
    val out = scores.localCheckpoint()
    e.unpersist(); nodes.unpersist()
    out
  }
}
