package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.DotProduct.vecDot

/** IVF-PQ — the top rung of the ANN ladder (brute force → SRP-LSH →
  * IVF → IVF-PQ): a coarse k-means quantizer buckets the corpus, each
  * vector stores only its bucket id plus the PQ codes of its RESIDUAL
  * (v − centroid), and a query scans just the `nprobe` buckets whose
  * centroids are nearest.
  *
  * This fixes the one scale flaw of plain [[ProductQuantizer.adcTopK]]:
  * ADC compresses the corpus 32× but still scans ALL of it per query.
  * Here the probe list is (queries × nprobe) rows — broadcast — and the
  * bucket equi-join prunes the corpus scan to nprobe/coarseK of its
  * rows WITHOUT the corpus ever shuffling (the encoded table is tiny:
  * bucket + m codes per vector, and can be written partitioned by
  * bucket so the scan prunes at the file level). Residual encoding is
  * what makes the shared codebook accurate across buckets: residuals
  * live near the origin regardless of which centroid a vector sits by.
  *
  * Determinism discipline (same as q346): coarse centroids AND PQ
  * codebooks are rounded to 6 dp before inlining as literals, so every
  * downstream assignment/encode/score is a bit-deterministic row-local
  * expression; all ranking ties break on neighbor id.
  */
object IvfPq {

  final case class Model(coarse: Seq[Seq[Double]],
                         pq: ProductQuantizer.Model)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** argmin-L2 bucket id over the literal coarse centroids:
    * min −2·v·c + |c|² (|v|² constant per row), ties to lowest id. */
  def bucketExpr(vec: Column, coarse: Seq[Seq[Double]]): Column = {
    val v = vec.cast("array<double>")
    val scores = array(coarse.map { c =>
      val cn2 = c.map(x => x * x).sum
      lit(-2.0) * vecDot(v, typedLit(c)) + lit(cn2)
    }: _*)
    (array_position(scores, array_min(scores)) - 1).cast("int")
  }

  /** residual = v − coarse[bucket], as a column expression. */
  private def residualExpr(vec: Column, bucket: Column,
                           coarse: Seq[Seq[Double]]): Column =
    zip_with(vec.cast("array<double>"),
      element_at(typedLit(coarse), bucket + 1), (a, b) => a - b)

  /** Train coarse quantizer + residual PQ codebooks. */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
          coarseK: Int = 8, m: Int = 8, codes: Int = 16,
          iters: Int = 3): Model = {
    val (centDf, _) = KMeans.fit(df, idCol, vecCol, coarseK, iters,
      computeInertia = false)
    val coarse = centDf.orderBy("centroid_id").collect()
      .map(_.getSeq[Double](1).map(r6).toSeq).toSeq
    // Cached across the PQ fit: each of the m sub-space k-means fits
    // scans this frame ~10 times (seed + per-iteration jobs), and every
    // uncached scan would re-run the coarse argmax + residual zip_with
    // over the full corpus — ~m × 10 recomputations of the assignment
    // expression. One materialization instead.
    val resid = df.select(col(idCol).as("vid"),
        residualExpr(col(vecCol), bucketExpr(col(vecCol), coarse), coarse)
          .as("rv"))
      .cache()
    val pq = ProductQuantizer.fit(resid, "vid", "rv", dim, m, codes, iters)
    resid.unpersist()
    Model(coarse, pq.copy(codebooks =
      pq.codebooks.map(_.map(_.map(r6)))))
  }

  /** Encode: (vid, bucket, codes). One narrow projection — at 100 TB,
    * write it `partitionBy("bucket")` and the probe join prunes files. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame = {
    val b = bucketExpr(col(vecCol), model.coarse)
    df.select(col(idCol).as("vid"), b.as("bucket"),
      ProductQuantizer.codesExpr(
        residualExpr(col(vecCol), b, model.coarse), model.pq).as("codes"))
  }

  /** Per-query nprobe nearest buckets: sort (score, bucket) structs,
    * slice, explode. The struct sort breaks score ties on bucket id. */
  private def probes(qv: Column, model: Model, nprobe: Int): Column = {
    val c = model.coarse
    val scores = array(c.indices.map { i =>
      val cn2 = c(i).map(x => x * x).sum
      struct((lit(-2.0) * vecDot(qv, typedLit(c(i))) + lit(cn2)).as("sc"),
             lit(i).as("b"))
    }: _*)
    transform(slice(array_sort(scores), 1, math.min(nprobe, c.length)),
              s => s.getField("b"))
  }

  /** ADC top-k over probed buckets only. Output:
    * (query_id, neighbor_id, rank, adist) — adist is the approximate
    * L2² of (q − centroid_bucket) against the neighbor's residual
    * codes, i.e. the FAISS IVF-PQ asymmetric distance. */
  def topK(encoded: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, model: Model, k: Int, nprobe: Int): DataFrame = {
    val m = model.pq.m
    val subDim = model.pq.subDim
    val probe = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", explode(probes(col("qv"), model, nprobe)))
      .withColumn("qr",
        residualExpr(col("qv"), col("bucket"), model.coarse))
      .select("query_id", "bucket", "qr")
    // corpus side never shuffles: the probe list (queries × nprobe) is
    // the broadcast side of a bucket equi-join
    val dist = expr(
      s"""aggregate(
            zip_with(codes, sequence(0, ${m - 1}),
                     (c, s) -> struct(c AS c, s AS s)),
            0.0D,
            (acc, p) -> acc + aggregate(
              zip_with(element_at(element_at(__cb, p.s + 1), p.c + 1),
                       slice(qr, p.s * $subDim + 1, $subDim),
                       (a, b) -> (a - b) * (a - b)),
              0.0D, (a2, d) -> a2 + d))""")
    val scored = encoded.join(broadcast(probe), Seq("bucket"))
      .filter(col("query_id") =!= col("vid"))
      .withColumn("__cb", typedLit(model.pq.codebooks))
      .select(col("query_id"), col("vid").as("neighbor_id"),
              dist.as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
