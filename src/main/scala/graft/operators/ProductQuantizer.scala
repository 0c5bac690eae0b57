package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.DotProduct.vecDot

/** Product quantization — the compression rung of the ANN ladder
  * (brute force → SRP-LSH → IVF → IVF-PQ): split each vector into `m`
  * sub-vectors, k-means each sub-space independently ([[KMeans]]), and
  * store per sub-space only the nearest code id. A dim-64 float vector
  * (256 B) becomes `m` small ints (8 B at m=8, codes=16) — the 32×
  * shrink is what lets a 100 TB embedding corpus fit scan-speed storage,
  * and asymmetric-distance (ADC) scoring never reconstructs the corpus
  * side.
  *
  * Spark-shaped like [[Similarity.ivfTopK]]: the fitted codebooks are
  * tiny (m × codes × subDim doubles), so they inline as LITERALS into
  * both the encoder and the ADC scorer — per-row narrow expressions
  * inside codegen, zero shuffles, zero joins for encode; one broadcast
  * of the (small) query side for scoring. No UDFs anywhere.
  */
object ProductQuantizer {

  /** codebooks(s)(c) = centroid vector c of sub-space s. */
  final case class Model(m: Int, subDim: Int,
                         codebooks: Seq[Seq[Seq[Double]]])

  /** Train per-sub-space codebooks with [[KMeans.fit]] (deterministic
    * init, Lloyd iterations). `dim` must be divisible by `m`. */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
          m: Int = 8, codes: Int = 16, iters: Int = 3): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val v = col(vecCol).cast("array<double>")
    // The m sub-space fits are independent models over disjoint slices
    // — submit them CONCURRENTLY so their (many, small) Spark jobs
    // interleave instead of serializing m × iters round-trips. A
    // DEDICATED pool sized to m (not the global ForkJoin pool): each
    // Future blocks on Spark actions, so on a small shared pool the
    // fits would serialize or starve unrelated global-pool work, and a
    // hung fit would block Await.result forever with no owner. Results
    // come back in sub-space order and each fit is deterministic, so
    // the codebooks are identical to the sequential run's.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(m)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val books =
      try Await.result(Future.sequence((0 until m).map { s =>
        Future {
          val sub = df.select(col(idCol).as("vid"),
            slice(v, s * subDim + 1, subDim).as("sub"))
          val (cents, _) = KMeans.fit(sub, "vid", "sub", codes, iters,
            computeInertia = false)
          // codebook ordered by centroid_id so code ids are stable
          cents.orderBy("centroid_id").collect()
            .map(_.getSeq[Double](1).toSeq).toSeq
        }
      }), Duration.Inf)
      finally pool.shutdown()
    Model(m, subDim, books)
  }

  /** The full m-code array for a vector column — public so the IVF-PQ
    * composition ([[IvfPq]]) can encode residual frames that carry
    * extra columns (bucket ids) this projection must not drop.
    * One native [[graft.functions.expressions.PqCodes]] call: the
    * earlier per-code literal composition (array of vecDots →
    * array_position∘array_min, × m sub-spaces) built a ~m·codes·subDim
    * expression tree that cost SECONDS of analyzer/codegen per plan;
    * the native form is O(1) tree with identical score math and tie
    * semantics, so codes are bit-unchanged. */
  def codesExpr(vec: Column, model: Model): Column =
    graft.functions.expressions.PqCodes.pqCodes(vec, model.codebooks)

  /** Encode: (id, codes array<int> of length m). One narrow projection. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame =
    df.select(col(idCol).as("vid"),
              codesExpr(col(vecCol), model).as("codes"))

  /** Reconstruct the quantized vector from codes (for diagnostics /
    * recall analysis; ADC scoring below never calls this per pair). */
  def decode(encoded: DataFrame, model: Model): DataFrame =
    encoded.withColumn("__cb", typedLit(model.codebooks))
      .select(col("vid"), expr(
        s"""flatten(transform(sequence(0, ${model.m - 1}),
              s -> element_at(element_at(__cb, s + 1),
                              element_at(codes, s + 1) + 1)))""")
        .as("approx_v"))

  /** Asymmetric-distance top-k: raw queries against the ENCODED corpus.
    * dist²(q, x) ≈ Σ_s |q_s − codebook_s[code_s(x)]|² — the corpus side
    * stays 8 bytes/vector; only the query (broadcast, small) is exact.
    * Output: (query_id, neighbor_id, rank, adist). */
  def adcTopK(encoded: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, model: Model, k: Int): DataFrame = {
    val cb = typedLit(model.codebooks) // [m][codes][subDim]
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val dist = expr(
      s"""aggregate(
            zip_with(codes, sequence(0, ${model.m - 1}),
                     (c, s) -> struct(c AS c, s AS s)),
            0.0D,
            (acc, p) -> acc + aggregate(
              zip_with(element_at(element_at(__cb, p.s + 1), p.c + 1),
                       slice(qv, p.s * ${model.subDim} + 1, ${model.subDim}),
                       (a, b) -> (a - b) * (a - b)),
              0.0D, (a2, d) -> a2 + d))""")
    val scored = encoded.join(broadcast(q), col("query_id") =!= col("vid"))
      .withColumn("__cb", cb)
      .select(col("query_id"), col("vid").as("neighbor_id"),
              dist.as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
