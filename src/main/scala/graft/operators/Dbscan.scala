package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked DBSCAN (Ester et al., KDD'96) over a 2-D plane — the
  * density companion of [[KMeans]]: k-means forces every point into a
  * sphere around a centroid; DBSCAN finds arbitrary-shape density modes
  * and names the NOISE points no mode claims (the outlier documents a
  * curation pass reviews by hand). The 2-D plane is the corpus-map
  * projection (first two embedding coordinates stand in here); grid
  * blocking is exact only in low dimension, which is why the high-dim
  * similarity paths stay SRP/IVF ([[Similarity]], [[IvfPq]]).
  *
  * Scale shape (the MR-DBSCAN decomposition, He et al. 2011):
  *
  *   1. Each point keys to its eps-sized grid cell — one narrow
  *      projection, no data movement beyond the cell-key shuffle.
  *   2. Candidate pairs probe the 3×3 neighbor cells: a constant 9×
  *      fan-out explode on the probe side equi-joined to home cells.
  *      In 2-D with cell side = eps·(1+1e-12) this is EXACT (any pair
  *      passing the dist² <= eps² test — including fp-rounding
  *      admissions a few ulps over eps — is in same or adjacent
  *      cells), zero false negatives. Each
  *      unordered pair survives `id_a < id_b` exactly once: the
  *      (a probes, b home) row passes iff a < b and the mirrored
  *      (b probes, a home) row iff b < a — no DISTINCT needed.
  *   3. Degrees and roles are integer hash-aggs on ids; core-core
  *      edges collapse via the spanning-forest contraction
  *      ([[ConnectedComponents]], min-id canonical label, isolated
  *      cores become singleton clusters).
  *   4. Border points take the MIN cluster among their core neighbors
  *      — the deterministic tie-break for DBSCAN's order-dependent
  *      border assignment.
  *
  * Distance math is double `dist² <= eps²` — identical IEEE ops on any
  * engine, no rounding needed for oracle agreement. Density skew (one
  * cell holding B points → B² candidate work) is real but LOCAL: the
  * pair count within a cell is the true neighbor count DBSCAN must
  * examine, and AQE skew-split spreads the biggest cells; the LSH
  * hot-bucket cap does not apply because these pairs are not sketch
  * collisions — they are the answer.
  */
object Dbscan {

  /** Grid-blocked eps-neighbor pairs WITH their exact squared
    * distance: (id_a, id_b, d2) for every unordered pair with
    * d2 <= eps² — step 1-2 of the MR-DBSCAN decomposition, shared
    * with [[SingleLink]] (which filters the SAME relation at each
    * dendrogram cut instead of re-blocking per threshold). Exactness
    * argument (cell inflation, once-per-pair survival) in the object
    * scaladoc. */
  def blockedPairs(df: DataFrame, idCol: String, xCol: String,
                   yCol: String, eps: Double): DataFrame = {
    val cell = eps * (1.0 + 1e-12)
    val p = df
      .select(col(idCol).cast("long").as("vec_id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / cell))
      .withColumn("cy", floor(col("y") / cell))
    val home = p.select(col("vec_id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val offs = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probe = p.select(col("vec_id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"), col("cx"), col("cy"), explode(offs).as("o"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    probe.join(home, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("d2") <= lit(eps * eps))
      .select(col("id_a"), col("id_b"), col("d2"))
  }

  /** @return one row per input point: (idCol, n_nb, role, cluster) —
    *         n_nb counts eps-neighbors INCLUDING self, role is
    *         core/border/noise, cluster is the min core id of the
    *         density component (-1 for noise). */
  def cluster(df: DataFrame, idCol: String, xCol: String, yCol: String,
              eps: Double, minPts: Int): DataFrame = {
    // cell side is eps inflated by 1e-12 relative: in exact arithmetic a
    // pair within eps spans adjacent cells, but fp rounding can admit a
    // pair whose true distance is a few ulps OVER eps (dist² rounds
    // down into <= eps²) while its cell quotients land 2 apart — the
    // slack re-covers that sliver. Inflation only ADDS candidates (the
    // exact dist² predicate still decides membership), so the result is
    // unchanged and the zero-false-negative contract is airtight rather
    // than ulp-lucky. The input projection inside blockedPairs is
    // deliberately NOT checkpointed (a corpus-sized narrow projection —
    // recomputing 3 columns off the scan is cheaper than materializing
    // the corpus); `pairs` IS, because its three consumers would each
    // replay the grid join.
    val p = df
      .select(col(idCol).cast("long").as("vec_id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val pairs = blockedPairs(df, idCol, xCol, yCol, eps)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint() // feeds degree, core edges, and border adjacency
    val deg = pairs.select(col("id_a").as("v"))
      .union(pairs.select(col("id_b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val pts = p.select(col("vec_id"))
      .join(deg, col("vec_id") === col("v"), "left")
      .select(col("vec_id"), (coalesce(col("d"), lit(0L)) + 1).as("n_nb"))
    val cores = pts.filter(col("n_nb") >= minPts).select(col("vec_id"))
    val coreEdges = pairs
      .join(cores.select(col("vec_id").as("id_a")), Seq("id_a"))
      .join(cores.select(col("vec_id").as("id_b")), Seq("id_b"))
    val comp = ConnectedComponents.components(coreEdges, "id_a", "id_b")
    val coreCl = cores.join(comp, col("vec_id") === col("id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("cluster"))
    val adj = pairs.select(col("id_a").as("v"), col("id_b").as("u"))
      .union(pairs.select(col("id_b"), col("id_a")))
    val border = adj
      .join(coreCl.select(col("vec_id").as("u"), col("cluster")), Seq("u"))
      .join(cores.select(col("vec_id").as("v")), Seq("v"), "left_anti")
      .groupBy("v").agg(min("cluster").as("cluster"))
    pts
      .join(coreCl.select(col("vec_id"), col("cluster").as("core_cl")),
        Seq("vec_id"), "left")
      .join(border.select(col("v").as("vec_id"), col("cluster").as("bord_cl")),
        Seq("vec_id"), "left")
      .select(col("vec_id").cast("long").as(idCol),
        col("n_nb").cast("long").as("n_nb"),
        when(col("core_cl").isNotNull, "core")
          .when(col("bord_cl").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("core_cl"), col("bord_cl"), lit(-1L)).cast("long")
          .as("cluster"))
  }
}
