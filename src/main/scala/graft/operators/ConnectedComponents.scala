package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (MinHash/SimHash/embedding candidates) into dedup CLUSTERS
  * with one canonical representative each; transitively-linked docs
  * must collapse together even when the endpoints never compared
  * directly.
  *
  * Algorithm: min-label propagation (Pregel-style, driver-coordinated
  * like GraphX): every vertex starts as its own label; each round a
  * vertex takes the min of its own and its neighbors' labels; fixpoint
  * = components. Rounds needed = graph diameter, and near-dup graphs
  * are shallow (dup clusters are cliques or short chains), so this
  * converges in a handful of rounds. Each round is one join + one
  * hash-aggregate — all distributed; the driver only checks the
  * converged flag. `localCheckpoint` truncates the growing lineage each
  * round (swap for `checkpoint` + checkpoint dir on a real cluster so
  * executor loss can't orphan the truncated plan).
  */
object ConnectedComponents {

  /** @return (id, component) — every vertex appearing in `edges`,
    *         labeled with the min vertex id reachable from it. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 maxIters: Int = 20): DataFrame = {
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint()

    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrLabels = und.join(labels, und("b") === labels("id"))
        .select(und("a").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(nbrLabels)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .isEmpty
      labels = next
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIters rounds")
    labels
  }
}
