package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA, relationally: an exact covariance (Gram) pass over
  * the corpus followed by a FIXED-count power iteration on the tiny
  * d×d matrix — the spectrum probe a curation pipeline runs before
  * trusting its embedding space (a top eigenvalue carrying most of the
  * variance means the embeddings collapsed toward one axis and
  * cosine-based dedup/ANN thresholds are suspect; see also the JL
  * distortion audit, q413).
  *
  * Scale shape:
  *
  *   - The covariance pass is the ONLY corpus-sized work, and its
  *     d²-keyed shuffle is the true FLOP count of XᵀX (each row
  *     contributes its d² outer product; Catalyst's partial hash-agg
  *     collapses per-partition contributions before the 4096-group
  *     shuffle, so the wire carries partition-count × d² rows, not
  *     corpus × d²).
  *   - The d²-row covariance is BOUNDED MODEL STATE (the KMeans /
  *     IvfPq centroid precedent) — iterations never touch the corpus
  *     again; the fixed `iters` matvecs run on the collected matrix
  *     driver-side in microseconds instead of 2·iters tiny cluster
  *     jobs.
  *
  * Determinism discipline (the cross-engine oracle contract): corpus
  * float sums are order-dependent at the last few ulps, so covariance
  * entries are round(6)'d FIRST — after that every engine iterates on
  * bit-identical doubles, and every downstream fold (matvec by j,
  * norms and Rayleigh by i) is an ascending-index sequential left fold
  * from 0.0, exactly what the unrolled SQL oracle's sorted list_sum
  * computes — making the eigenvector bit-exact, not just float-close.
  * The sign is fixed by flipping so component 0 is non-negative.
  */
object Pca {

  /** Fitted top component: `loadings` sign-fixed (loadings(0) >= 0),
    * `means` round(6)'d — the determinism boundary for downstream
    * per-row scoring (centering with rounded means keeps every score
    * bit-identical across engines). */
  case class Model(loadings: Array[Double], means: Array[Double],
                   eigenvalue: Double, trace: Double)

  /** The exploded (rid, i, xi) relation, checkpointed once — every
    * downstream consumer (product join twice, raw means, rounded
    * means) reads the materialized copy, never the corpus again. */
  private def exploded(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("rid"),
        posexplode(col(vecCol)).as(Seq("i", "xi")))
      .select(col("rid"), col("i"), col("xi").cast("double").as("xi"))
      .localCheckpoint()

  private def covFromX(x: DataFrame): DataFrame = {
    val means = x.groupBy("i")
      .agg((sum("xi") / count(lit(1))).as("m"))
    val prod = x.as("a").join(x.as("b"), col("a.rid") === col("b.rid"))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        (col("a.xi") * col("b.xi")).as("p"))
      .groupBy("i", "j").agg(sum("p").as("sp"), count(lit(1)).as("n"))
    prod
      .join(means.select(col("i"), col("m").as("mi")), Seq("i"))
      .join(means.select(col("i").as("j"), col("m").as("mj")), Seq("j"))
      .select(col("i"), col("j"),
        round(col("sp") / col("n") - col("mi") * col("mj"), 6).as("c"))
  }

  /** Population covariance of `vecCol` (array of numerics, `dim` wide),
    * one row per (i, j) ∈ [0, dim)², entries round(6)'d — the
    * determinism boundary documented above. */
  def covariance(df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame =
    covFromX(exploded(df, idCol, vecCol))

  /** Driver-side power loop over a collected matrix: (unsigned v, λ,
    * trace) with the oracle-matching ascending-index folds. */
  private def iterate(m: Array[Array[Double]], dim: Int,
                      iters: Int): (Array[Double], Double, Double) = {
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }; s
      }
    def fold(t: Int => Double): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += t(i); i += 1 }; s
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = matvec(v)
      val nm = math.sqrt(fold(i => w(i) * w(i)))
      v = w.map(_ / nm)
    }
    val w = matvec(v)
    (v, fold(i => v(i) * w(i)), fold(i => m(i)(i)))
  }

  private def collectMatrix(cov: DataFrame, dim: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](dim, dim)
    cov.collect().foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    m
  }

  /** Top eigenpair of a (i, j, c) matrix relation by `iters` power
    * steps from the uniform start 1/√dim.
    * @return one row per dimension: (i, loading, eigenvalue,
    *         var_explained), sign-fixed so loading(0) >= 0. */
  def powerIteration(cov: DataFrame, dim: Int, iters: Int): DataFrame = {
    val spark = cov.sparkSession
    import spark.implicits._
    val (v, lam, tr) = iterate(collectMatrix(cov, dim), dim, iters)
    val sg = if (v(0) < 0) -1.0 else 1.0
    spark.createDataset((0 until dim).map(i => (i.toLong, v(i))))
      .select(col("_1").as("i"),
        round(col("_2") * sg, 6).as("loading"),
        round(lit(lam), 6).as("eigenvalue"),
        round(lit(lam) / tr, 6).as("var_explained"))
  }

  /** Top-k model: sign-fixed (loadings, λ) per component in spectral
    * order, the round(6)'d means for downstream centering, and the
    * ORIGINAL trace for variance-explained ratios. */
  case class TopK(components: Seq[(Array[Double], Double)],
                  means: Array[Double], trace: Double)

  /** Top-k eigenpairs by Hotelling deflation: after each fitted pair,
    * C ← C − λ·v·vᵀ (computed with the UNSIGNED vector — vᵢ·vⱼ is
    * sign-invariant, so engines agree regardless of flip) and the
    * power loop restarts from the uniform seed. One corpus pass for
    * the covariance + one d-row agg for the means; the k·iters
    * matvecs are driver-side on the collected matrix. */
  def fitTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              k: Int, iters: Int): TopK = {
    val x = exploded(df, idCol, vecCol)
    var m = collectMatrix(covFromX(x), dim)
    val means = new Array[Double](dim)
    x.groupBy("i")
      .agg(round(sum("xi") / count(lit(1)), 6).as("m"))
      .collect().foreach(r => means(r.getInt(0)) = r.getDouble(1))
    var trace = 0.0
    val out = (0 until k).map { c =>
      val (v, lam, tr) = iterate(m, dim, iters)
      if (c == 0) trace = tr
      m = Array.tabulate(dim, dim)((i, j) => m(i)(j) - lam * v(i) * v(j))
      val sg = if (v(0) < 0) -1.0 else 1.0
      (v.map(_ * sg), lam)
    }
    TopK(out, means, trace)
  }

  /** Fits the top component and collects it as driver-side model state
    * (d + d² doubles — bounded, the centroid precedent): one corpus
    * pass for the covariance, one d-row agg for the rounded means. */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
          iters: Int): Model = {
    val top = fitTopK(df, idCol, vecCol, dim, k = 1, iters = iters)
    val (v, lam) = top.components.head
    Model(v, top.means, lam, top.trace)
  }
}
