package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Agglomerative SINGLE-LINK clustering read off at a discrete
  * threshold ladder — the hierarchical view over the same 2-D
  * corpus-map plane [[Dbscan]] densifies: single-link at distance
  * threshold eps is EXACTLY the connected components of the
  * eps-neighbor graph (two clusters merge the moment any cross pair
  * is within eps), so each dendrogram CUT is one spanning-forest run
  * over a filtered pair relation and the full dendrogram never needs
  * the classic O(n²) successive-merge loop.
  *
  * Why a ladder instead of the exact merge tree: the merge HEIGHTS
  * are data-dependent (an until-fixpoint structure — the same reason
  * k-core peeling was rejected as un-oracle-able), but any FIXED set
  * of cuts is deterministic, relational, and replayable by a
  * recursive-CTE closure per cut. The cuts ARE the dendrogram's
  * usable API: a curation pass asks "memberships at coarse / medium /
  * fine", not for the tree object.
  *
  * Scale shape: the pair relation is grid-blocked ONCE at the largest
  * cut ([[Dbscan.blockedPairs]] — zero false negatives in 2-D) and
  * carries exact d²; every finer cut FILTERS that materialized
  * relation (edges(eps) ⊆ edges(epsMax)) instead of re-blocking, then
  * runs the [[ConnectedComponents]] contraction. Nesting is by
  * construction: edge sets grow monotonically with eps, so a coarser
  * cut's partition is a coarsening of a finer cut's (pinned in the
  * spec).
  *
  * Reference scope: no clustering exists in the reference; this is
  * extension surface next to [[KMeans]]/[[Dbscan]] in the corpus-map
  * family.
  */
object SingleLink {

  /** Cluster memberships at each cut of the ladder.
    *
    * `epsCuts` must be ascending. Output: (id, cut0, cut1, ...) with
    * cutK = min-id component label of the epsCuts(K)-neighbor graph
    * (isolated points label themselves). */
  def cuts(df: DataFrame, idCol: String, xCol: String, yCol: String,
           epsCuts: Seq[Double]): DataFrame = {
    require(epsCuts.nonEmpty && epsCuts == epsCuts.sorted,
      s"epsCuts must ascend: $epsCuts")
    val pairs = Dbscan
      .blockedPairs(df, idCol, xCol, yCol, epsCuts.max)
      .localCheckpoint() // every cut filters this one relation
    val ids = df.select(col(idCol).cast("long").as("id"))
    epsCuts.zipWithIndex.foldLeft(ids) { case (acc, (eps, k)) =>
      val comp = ConnectedComponents.components(
        pairs.filter(col("d2") <= lit(eps * eps))
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      acc.join(comp.select(col("id"), col("component")), Seq("id"), "left")
        .withColumn(s"cut$k", coalesce(col("component"), col("id")))
        .drop("component")
    }
  }
}
