package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (MinHash/SimHash/embedding candidates) into dedup CLUSTERS
  * with one canonical representative each; transitively-linked docs
  * must collapse together even when the endpoints never compared
  * directly.
  *
  * Algorithm: distributed spanning-forest contraction (hash-to-min
  * family — see Rastogi et al., "Finding Connected Components in
  * Map-Reduce in Logarithmic Rounds", ICDE'13):
  *
  *   1. Each partition runs a LOCAL union-find over its edges and
  *      replaces them with a spanning star (v → partition-local min
  *      root). No shuffle; edge count drops to < #local vertices while
  *      connectivity is exactly preserved.
  *   2. Stars are hash-repartitioned by vertex, so a vertex seen by
  *      several partitions brings its (conflicting) roots together for
  *      the next local pass — the merge that propagates connectivity
  *      across partition boundaries. Repeat while the edge set is
  *      still large; each round contracts by the local clustering
  *      factor and the round count is O(log diameter).
  *   3. When the surviving star forest is small (≤ `localFinishEdges`,
  *      default 2M edges ≈ 32 MB — near-dup graphs contract far below
  *      this because components are tiny relative to the corpus), one
  *      single-task union-find labels every remaining vertex exactly.
  *
  * vs round-2's per-round join+aggregate label propagation: a round
  * here is ONE mapPartitions + one shuffle instead of two joins, an
  * aggregate and two materializations — on the bench graph (1.5k
  * vertices) that's 2 jobs instead of ~24, and at 100 TB the
  * contraction touches each edge O(log) times with no driver-side
  * iteration over data.
  */
object ConnectedComponents {

  /** Partition-local union-find: replaces the partition's edges with
    * min-rooted spanning stars (v, root(v)) for every non-root vertex. */
  private def contract(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    it.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { // union by MIN id so roots are canonical labels
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
        parent.getOrElseUpdate(math.min(ra, rb), math.min(ra, rb))
      }
    }
    parent.keysIterator.flatMap { v =>
      val r = find(v)
      if (r != v) Iterator.single((v, r)) else Iterator.empty
    }
  }

  /** @return (id, component) — every vertex appearing in `edges`,
    *         labeled with the min vertex id reachable from it. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 maxIters: Int = 20,
                 localFinishEdges: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val vertices = edges.select(col(srcCol).cast("long").as("id"))
      .union(edges.select(col(dstCol).cast("long").as("id")))
      .distinct()

    var e: Dataset[(Long, Long)] = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("_1"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("_2"))
      .filter(col("_1") =!= col("_2"))
      .distinct()
      .as[(Long, Long)]

    var n = e.count()
    var i = 0
    while (n > localFinishEdges && i < maxIters) {
      e = e.mapPartitions(contract)
        .repartition(col("_1"))
        .localCheckpoint() // truncate lineage; swap for checkpoint() on a real cluster
      n = e.count()
      i += 1
    }
    require(n <= localFinishEdges,
      s"star forest still has $n edges after $i contraction rounds — " +
        s"raise localFinishEdges or maxIters")

    // Bounded single-task finish over the contracted star forest: the
    // full remaining graph fits one task by construction (≤
    // localFinishEdges pairs), and union-find labels every surviving
    // vertex with its exact min-reachable root.
    val labeled = e.coalesce(1).mapPartitions { it =>
      val parent = mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val nn = parent(c); parent(c) = r; c = nn }
        r
      }
      it.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      parent.keysIterator.map(v => (v, find(v)))
    }.toDF("id", "component")

    // Vertices contracted away in earlier rounds are already labeled
    // (they appear in `labeled` via their star edges — stars keep both
    // endpoints alive every round); self-pair-only vertices fall back
    // to their own id.
    vertices.join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
