package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.functions.expressions.DotProduct.vecDot

/** Similarity search over embedding columns.
  *
  * Two paths, as a scale ladder:
  *   - [[bruteForceTopK]] — exact: queries × corpus with the (small)
  *     query side broadcast, ranked per query. Cost O(|Q|·|C|·d); right
  *     whenever |Q| is modest. At 100 TB the corpus side stays
  *     partitioned, never shuffles, and each partition streams once.
  *   - [[srpTopK]] — approximate: signed-random-projection (SRP) LSH.
  *     Each vector reduces to a `bits`-bit signature (signs of dot
  *     products with deterministic pseudo-random hyperplanes); vectors
  *     sharing any signature band become candidates and only candidates
  *     pay the exact-cosine cost. Hyperplanes derive from a hash of
  *     (bit, dim) — data-independent and reproducible, no fitted state
  *     to ship.
  */
object Similarity {

  /** Upper bound on centroids inlined as plan literals (ivfTopK /
    * semanticDedup assignment): each centroid contributes a d-element
    * literal array to one giant argmax expression, and past a few
    * hundred the generated code risks JVM constant-pool / 64KB-method
    * limits (and compile time grows superlinearly). 1024×64 doubles is
    * comfortably inside those limits; beyond it the right design is a
    * broadcast join + argmax aggregate, not a bigger expression tree. */
  val MaxLiteralCentroids = 1024

  /** ABSOLUTELY bounded deterministic sample: the `n` rows with the
    * smallest md5(id) (ties to the lower id) — the
    * [[QualityClassifier.fit]] / [[IvfPq.fit]] sampling discipline as
    * a reusable relation. Plans as TakeOrderedAndProject: per-partition
    * top-n heaps, n rows to the driver side of the exchange — so the
    * cost of anything downstream (a brute-force recall truth leg
    * especially) is n·|corpus|, NEVER a fixed fraction of the corpus.
    * A modulus sample (`id % 50 = 0`) is 2% of the corpus FOREVER —
    * its brute truth leg is N²/50; this one's is K·N. Reproducible
    * under retries and independent of corpus scale; the SQL twin is
    * `ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT n`. */
  def hashSample(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol)).limit(n).drop("__h")

  /** Exact top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank, cosine).
    *
    * Norms are computed ONCE per side before the pair join (O(n·d)), not
    * per pair (O(n²·d)) — at 5k vectors that's 2.5M avoided 64-element
    * folds; at 100 TB it's the difference between a linear prepass and
    * tripling the join cost. Vectors pre-cast to double once for the
    * same reason. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
                           toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
                          toDoubleVec(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val cos = when(col("qn") * col("cn") === 0.0, 0.0)
      .otherwise(vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic hyperplane component for (bit, dim) in [-1, 1).
    * Plain Scala (not an Expression): hyperplanes are data-independent,
    * so they're computed once on the driver and shipped as literals —
    * which also makes them bakeable into an SQL oracle (q30's DuckDB
    * twin inlines these exact doubles; shortest-repr round-trip keeps
    * them bit-identical across engines). */
  def hyperplane(bit: Int, dim: Int): Array[Double] = {
    (0 until dim).map { d =>
      val h = scala.util.hashing.MurmurHash3.productHash((bit, d))
      (h.toDouble / Int.MaxValue)
    }.toArray
  }

  /** SRP signature column: bit b = sign(v · hyperplane_b). */
  def srpSignature(vecCol: Column, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      val w = array(hyperplane(b, dim).map(lit): _*)
      when(dot(vecCol, w) > 0, lit(1 << b)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }

  /** Approximate top-k via SRP-LSH band candidates + exact re-rank.
    * Output: (query_id, neighbor_id, rank, cosine) — same shape as
    * bruteForceTopK so recall is directly measurable. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int,
              bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val r = bits / bands
    val mask = (1 << r) - 1

    def withBands(df: DataFrame, id: String, vecOut: String, normOut: String): DataFrame = {
      val sig = srpSignature(col(vecCol), bits, dim)
      df.select(col(idCol).as(id), toDoubleVec(col(vecCol)).as(vecOut), sig.as("sig"))
        .withColumn(normOut, norm(col(vecOut)))
        .select(col(id), col(vecOut), col(normOut),
                posexplode(array((0 until bands).map(b =>
                  shiftright(col("sig"), b * r).bitwiseAND(mask)): _*)))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
    }

    val qb = withBands(queries, "query_id", "qv", "qn")
    val cb = withBands(corpus, "neighbor_id", "cv", "cn")
    val cand = qb.join(cb, Seq("band_idx", "band_key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              col("qv"), col("cv"), col("qn"), col("cn"))
      .distinct()
    val cos = when(col("qn") * col("cn") === 0.0, 0.0)
      .otherwise(vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Semi-hard negative mining for contrastive training (the band of
    * Schroff et al. 2015 "FaceNet", the SBERT / SimCSE hard-negative
    * recipe): for each query vector, the `k` highest-cosine
    * OTHER-label candidates whose cosine lies in [loCos, hiCos) —
    * close enough to be informative, but below the near-duplicate
    * band that would poison training with false negatives (a near-dup
    * of the query is almost surely a missed positive, not a negative).
    * Same-label candidates are excluded outright: they are presumed
    * positives under the contrastive labeling.
    *
    * Candidates come from the SAME SRP-LSH band index as [[srpTopK]]
    * (reference scope: the capstone has no vector ops at all; this is
    * the training-data extension surface) — the corpus shuffles once
    * by (band_idx, band_key), never all-pairs, and pays exact cosine
    * re-rank only on banded candidates, so at 100 TB mining cost is
    * one banded equi-join per epoch. Ranking happens AFTER the band
    * filter, so `rank` is dense over the in-band negatives.
    *
    * Output: (query_id, neighbor_id, cos, rank), rank 1 = hardest
    * in-band negative.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int, dim: Int,
                    loCos: Double, hiCos: Double,
                    bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, "bits must split evenly into bands")
    require(loCos < hiCos, "semi-hard band must be non-empty")
    val r = bits / bands
    val mask = (1 << r) - 1

    def withBands(df: DataFrame, id: String, lab: String, vecOut: String,
                  normOut: String): DataFrame = {
      val sig = srpSignature(col(vecCol), bits, dim)
      df.select(col(idCol).as(id), col(labelCol).as(lab),
                toDoubleVec(col(vecCol)).as(vecOut), sig.as("sig"))
        .withColumn(normOut, norm(col(vecOut)))
        .select(col(id), col(lab), col(vecOut), col(normOut),
                posexplode(array((0 until bands).map(b =>
                  shiftright(col("sig"), b * r).bitwiseAND(mask)): _*)))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
    }

    val qb = withBands(queries, "query_id", "q_lab", "qv", "qn")
    val cb = withBands(corpus, "neighbor_id", "c_lab", "cv", "cn")
    val cand = qb.join(cb, Seq("band_idx", "band_key"))
      .filter(col("query_id") =!= col("neighbor_id") &&
              col("q_lab") =!= col("c_lab"))
      .select(col("query_id"), col("neighbor_id"),
              col("qv"), col("cv"), col("qn"), col("cn"))
      .distinct()
    val cos = when(col("qn") * col("cn") === 0.0, 0.0)
      .otherwise(vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .filter(col("cos") >= loCos && col("cos") < hiCos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Multi-probe SRP-LSH top-k: same index as [[srpTopK]] (the corpus
    * side is byte-identical — `bands` band keys per vector), but each
    * QUERY band additionally probes the `r` keys at Hamming distance 1
    * (one sign-bit flip). The near-miss case SRP banding loses — a
    * vector pair differing in exactly one hyperplane sign within a
    * band — becomes a candidate again, so recall rises at the SAME
    * index size; the cost is query-side only (×(r+1) probe rows), which
    * is the multi-probe trade (Lv et al. 2007): probes are cheap,
    * re-indexing is not. Candidates still pay exact re-rank, so
    * precision is unaffected. At 100 TB the probe explosion happens on
    * the small query side before the same banded equi-join — the corpus
    * never re-shuffles and the index is shared with single-probe
    * readers. */
  def srpMultiProbeTopK(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int, dim: Int,
                        bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val r = bits / bands
    val mask = (1 << r) - 1

    def prep(df: DataFrame, id: String, vecOut: String, normOut: String): DataFrame = {
      val sig = srpSignature(col(vecCol), bits, dim)
      df.select(col(idCol).as(id), toDoubleVec(col(vecCol)).as(vecOut), sig.as("sig"))
        .withColumn(normOut, norm(col(vecOut)))
        .select(col(id), col(vecOut), col(normOut),
                posexplode(array((0 until bands).map(b =>
                  shiftright(col("sig"), b * r).bitwiseAND(mask)): _*)))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
    }

    // query side: the exact key plus its r one-bit flips
    val qb = prep(queries, "query_id", "qv", "qn")
      .withColumn("band_key",
        explode(array(col("band_key") +:
          (0 until r).map(j => col("band_key").bitwiseXOR(lit(1 << j))): _*)))
    val cb = prep(corpus, "neighbor_id", "cv", "cn")
    val cand = qb.join(cb, Seq("band_idx", "band_key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              col("qv"), col("cv"), col("qn"), col("cn"))
      .distinct()
    val cos = when(col("qn") * col("cn") === 0.0, 0.0)
      .otherwise(vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** QUERY-DIRECTED probe rows — the full Lv et al. 2007 multi-probe
    * algorithm, where [[srpMultiProbeTopK]] is the naive
    * all-Hamming-1 special case: each vector emits its `bands` exact
    * band keys PLUS the `probes` perturbed keys with the smallest
    * boundary distance — a perturbation flips 1 or 2 of a band's sign
    * bits, scored by the summed |dot| of the flipped hyperplanes (a
    * bit whose projection is near zero is the bit most likely to be
    * on the wrong side for a true neighbor), and the probe sequence
    * takes the global top-`probes` perturbations under the total
    * order (score, band, mask). Everything is row-local array math in
    * one projection — the index side is this same function with
    * probes = 0 (exact keys only), so the INDEX is never re-built or
    * re-shuffled to serve more probes; probe fan-out is query-side
    * rows into the same banded equi-join, the multi-probe trade.
    * Wider default geometry than [[srpTopK]] (36 bits = 6 bands × 6):
    * finer buckets cut the per-probe candidate cost so the probe
    * budget buys recall instead of flooding — measured in
    * q435_directed_probe_bitext (recall ≈ 0.61 at ≈ 0.30 candidate
    * fraction vs single-probe 0.38 at 0.23 on the bitext audit).
    * Deterministic: hyperplanes are the shared literal family, scores
    * are single IEEE adds of |dot|s in fixed (j asc) order, ties break
    * on (band, mask) — an SQL oracle replays the exact probe set.
    * Output: (idCol, band, key) probe rows. */
  def directedProbeRows(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, bands: Int = 6, r: Int = 6,
                        probes: Int = 16): DataFrame = {
    require(r <= 30, s"band keys pack into an Int: r=$r")
    val bits = bands * r
    val dots = array((0 until bits).map { b =>
      dot(col(vecCol), array(hyperplane(b, dim).map(lit): _*))
    }: _*)
    val withDots = df.select(col(idCol), dots.as("__d"))
    def key(b: Int): Column = (0 until r).map { j =>
      when(element_at(col("__d"), b * r + j + 1) > 0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val exact = (0 until bands).map(b =>
      struct(lit(b).as("band"), element_at(col("__k"), b + 1).as("key")))
    val base = withDots.withColumn("__k", array((0 until bands).map(key): _*))
    val probed =
      if (probes <= 0) base.select(col(idCol), explode(array(exact: _*)).as("bk"))
      else {
        // perturbations: every 1- and 2-bit flip per band, scored by
        // the flipped hyperplanes' summed |dot| (j-ascending add order)
        val subs: Seq[(Int, Seq[Int])] =
          (0 until r).map(j => (1 << j, Seq(j))) ++
            (for { j <- 0 until r; l <- j + 1 until r }
              yield ((1 << j) | (1 << l), Seq(j, l)))
        val pert = for { b <- 0 until bands; (mask, js) <- subs } yield
          struct(
            js.map(j => abs(element_at(col("__d"), b * r + j + 1)))
              .reduce(_ + _).as("score"),
            lit(b).as("band"), lit(mask).as("mask"))
        val top = slice(sort_array(array(pert: _*)), 1, probes)
        base.select(col(idCol),
          explode(concat(array(exact: _*),
            transform(top, p =>
              struct(p.getField("band").as("band"),
                element_at(col("__k"), p.getField("band") + 1)
                  .bitwiseXOR(p.getField("mask")).as("key"))))).as("bk"))
      }
    probed.select(col(idCol), col("bk.band").as("band"),
      col("bk.key").as("key"))
  }

  /** Embedding near-dup pairs for UNLABELED corpora: SRP bands as the
    * blocking key (the path [[nearDupPairs]]' scaladoc promises when no
    * label exists) — vectors sharing any signature band become
    * candidates, exact cosine ≥ threshold verifies. Precision is exact
    * (every emitted pair carries its true cosine); recall is the LSH
    * collision probability (1−(1−p_bit^r)^bands, p_bit = 1−θ/π), tuned
    * by bits/bands exactly as in [[srpTopK]]. Deterministic hyperplanes
    * make the candidate set — and therefore the output — replayable by
    * an SQL oracle and invariant to partitioning. At 100 TB: the only
    * join is banded (never all-pairs), and each side carries its
    * precomputed norm through the band explode. */
  def nearDupPairsSrp(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, dim: Int,
                      bits: Int = 16, bands: Int = 4,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(bits % bands == 0)
    val r = bits / bands
    val mask = (1 << r) - 1
    val sig = srpSignature(col(vecCol), bits, dim)
    // maxBucket: the Dedup hot-bucket cap — an embedding corpus with a
    // dominant mode (near-identical templated pages) floods one band
    // bucket, and its B² candidate pairs are the same quadratic the
    // text LSH paths guard; over-cap buckets skip deterministically
    val banded = Dedup.dropHotBuckets(
      df.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"), sig.as("sig"))
        .withColumn("n", norm(col("v")))
        .select(col("id"), col("v"), col("n"),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("sig"), b * r).bitwiseAND(mask)): _*)))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key"),
      Seq("band_idx", "band_key"), maxBucket)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    val cos = when(col("na") * col("nb") === 0.0, 0.0)
      .otherwise(vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
    cand.select(col("id_a"), col("id_b"), cos.as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** IVF (inverted-file) approximate top-k — the third rung of the ANN
    * scale ladder: partition the corpus into centroid buckets once
    * (assignment is O(|C|·K·d)), then each query probes only its
    * `nprobe` nearest buckets. The K centroids are collected once and
    * inlined as plan literals, so at 100 TB the corpus assignment is a
    * NARROW projection — no shuffle, no join, K codegen'd dot products
    * per row — and the candidate join touches ~nprobe/K of the data.
    * Centroids are caller-supplied (here: a deterministic subset
    * standing in for a k-means fit, which would be offline state in
    * production). NOTE: collecting the centroids is an EAGER "fit
    * materialization" job at plan-build time (cache the centroid
    * DataFrame if calling repeatedly), and an empty centroid set fails
    * fast rather than returning a silently empty result. Output matches
    * bruteForceTopK so recall is directly measurable.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, centroids: DataFrame,
              centroidIdCol: String, nprobe: Int): DataFrame = {
    // id cast to long up front so the literal extraction below accepts
    // any integral centroid-id column, not just LongType
    val cent = centroids.select(col(centroidIdCol).cast("long").as("centroid_id"),
                                toDoubleVec(col(vecCol)).as("centv"))
      .withColumn("centn", norm(col("centv")))

    // Centroids are fitted state, small by contract (K vectors) — pull
    // them to the driver ONCE and inline them as literals, so corpus
    // assignment becomes a NARROW per-row argmax expression: zero
    // shuffle, zero join, K fused dot products per row inside codegen.
    // (A window rank here would shuffle and sort the |corpus|×K cross
    // product; even an argmax aggregate still exchanges one row per
    // vector.) Ties break to the lowest centroid_id via the negated id
    // in the ordering struct, matching the oracle.
    val centLocal: Array[(Long, Array[Double], Double)] = cent.collect().map { r =>
      val id = r.getLong(0)
      val v  = r.getSeq[Double](1).toArray
      (id, v, r.getDouble(2))
    }
    require(centLocal.nonEmpty, "ivfTopK needs at least one centroid")
    require(centLocal.length <= Similarity.MaxLiteralCentroids,
      s"ivfTopK inlines each centroid as an argmax literal; " +
      s"${centLocal.length} centroids would exceed the " +
      s"${Similarity.MaxLiteralCentroids}-centroid codegen budget — " +
      "use a coarser quantizer or switch assignment to a broadcast join")

    // One (ccos, -id, id) struct per centroid — the SINGLE place the
    // scoring + tie-break live, shared by argmax (assignment) and
    // sort-slice (probing) so they can't drift from the oracle.
    def scoredStructs(vecOut: String, normOut: String): Seq[Column] =
      centLocal.toSeq.map { case (id, v, cn) =>
        val cvLit = array(v.map(lit): _*)
        val ccos =
          if (cn == 0.0) lit(0.0)
          else when(col(normOut) === 0.0, 0.0)
            .otherwise(vecDot(col(vecOut), cvLit) / (col(normOut) * lit(cn)))
        struct(ccos.as("s"), lit(-id).as("nid"), lit(id).as("id"))
      }

    def withVec(df: DataFrame, id: String, vecOut: String, normOut: String) =
      df.select(col(idCol).as(id), toDoubleVec(col(vecCol)).as(vecOut))
        .withColumn(normOut, norm(col(vecOut)))

    val assigned = withVec(corpus, "neighbor_id", "cv", "cn")
      .withColumn("bucket",
        array_max(array(scoredStructs("cv", "cn"): _*)).getField("id"))

    // The probe side needs the top `nprobe` centroids per query; the
    // query set is small by contract, so a bucket-explode via the same
    // literal centroid scores stays driver-free and narrow too: score
    // all K, sort, slice nprobe, explode.
    val probes = withVec(queries, "query_id", "qv", "qn")
      .withColumn("bucket", explode(slice(transform(
        sort_array(array(scoredStructs("qv", "qn"): _*), asc = false),
        s => s.getField("id")), 1, nprobe)))

    val cos = when(col("qn") * col("cn") === 0.0, 0.0)
      .otherwise(vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    // each corpus vector lives in exactly one bucket, so probe fan-out
    // cannot duplicate candidates — no distinct needed
    assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** SemDeDup-style semantic near-dup pairs: centroid-bucket blocking —
    * a LEARNED blocking key, needing no label column — then exact
    * within-bucket cosine >= threshold.
    *
    * The quantizer centroids (typically a [[KMeans.fit]] output, or any
    * deterministic stand-in) are collected once and inlined as literals,
    * so corpus assignment is the same zero-shuffle narrow argmax
    * projection as [[ivfTopK]]'s; after that only same-bucket pairs are
    * ever scored — candidate volume is Σ|bucket|²/2, never |corpus|²/2.
    * Assignment ties break to the lowest centroid id, matching the SQL
    * oracle's ROW_NUMBER tie-break. The assigned frame is materialized
    * once (localCheckpoint) because the pair join reads it twice.
    * Output: (bucket, id_a, id_b, cos). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, centroidIdCol: String,
                    threshold: Double): DataFrame = {
    val cent = centroids.select(
        col(centroidIdCol).cast("long").as("centroid_id"),
        toDoubleVec(col(vecCol)).as("centv"))
      .withColumn("centn", norm(col("centv")))
    val centLocal: Array[(Long, Array[Double], Double)] = cent.collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2))
    }
    require(centLocal.nonEmpty, "semanticDedup needs at least one centroid")
    require(centLocal.length <= Similarity.MaxLiteralCentroids,
      s"semanticDedup inlines each centroid as an argmax literal; " +
      s"${centLocal.length} centroids would exceed the " +
      s"${Similarity.MaxLiteralCentroids}-centroid codegen budget — " +
      "use a coarser quantizer or switch assignment to a broadcast join")
    val scored = centLocal.toSeq.map { case (cid, v, cn) =>
      val cvLit = array(v.map(lit): _*)
      val ccos =
        if (cn == 0.0) lit(0.0)
        else when(col("n") === 0.0, 0.0)
          .otherwise(vecDot(col("v"), cvLit) / (col("n") * lit(cn)))
      struct(ccos.as("s"), lit(-cid).as("nid"), lit(cid).as("id"))
    }
    val assigned = df
      .select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("bucket", array_max(array(scored: _*)).getField("id"))
      .localCheckpoint()
    val a = assigned.select(col("id").as("id_a"), col("v").as("va"),
                            col("n").as("na"), col("bucket"))
    val b = assigned.select(col("id").as("id_b"), col("v").as("vb"),
                            col("n").as("nb"), col("bucket"))
    val cos = when(col("na") * col("nb") === 0.0, 0.0)
      .otherwise(vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("bucket"), col("id_a"), col("id_b"), cos.as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding near-dup pairs: same-`blockCol` blocking (no all-pairs
    * blowup), exact cosine >= threshold. Norms precomputed per side,
    * not per pair (see bruteForceTopK). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   blockCol: String, threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"),
                         col(blockCol).as("blk"))
      .withColumn("n", norm(col("v")))
    val a = base.select(col("id").as("id_a"), col("v").as("va"),
                        col("n").as("na"), col("blk"))
    val b = base.select(col("id").as("id_b"), col("v").as("vb"),
                        col("n").as("nb"), col("blk"))
    val cos = when(col("na") * col("nb") === 0.0, 0.0)
      .otherwise(vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("blk"), col("id_a"), col("id_b"), cos.as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** EMBEDDING-SPACE decontamination — the semantic companion of the
    * n-gram path (q75): n-gram overlap misses PARAPHRASED benchmark
    * leakage (same meaning, different surface form); cosine against
    * the eval set's embeddings catches it. Composition: the eval set's
    * SRP band index is tiny by contract (eval suites are KBs against a
    * 100 TB corpus) so it BROADCASTS, and the corpus side is a narrow
    * signature projection + band explode streaming map-side through
    * the equi-join — the corpus never shuffles for candidate
    * generation; only the (small) hit set moves for the per-doc
    * rollup. Every candidate is verified with exact cosine, so flags
    * are precise; recall is the banded SRP collision probability,
    * tuned by bits/bands as in [[srpTopK]]. Deterministic hyperplanes
    * keep the output SQL-replayable ([[hyperplane]]).
    * Output: (id, n_eval_hits, max_cos) for corpus rows with at least
    * one eval neighbor at cosine ≥ threshold. */
  def decontaminateByEmbedding(corpus: DataFrame, evalSet: DataFrame,
                               idCol: String, vecCol: String,
                               threshold: Double, dim: Int,
                               bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val r = bits / bands
    val mask = (1 << r) - 1
    def banded(df: DataFrame, id: String, vecOut: String,
               normOut: String): DataFrame = {
      val sig = srpSignature(col(vecCol), bits, dim)
      df.select(col(idCol).as(id), toDoubleVec(col(vecCol)).as(vecOut),
          sig.as("sig"))
        .withColumn(normOut, norm(col(vecOut)))
        .select(col(id), col(vecOut), col(normOut),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("sig"), b * r).bitwiseAND(mask)): _*)))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
    }
    val cb = banded(corpus, "id", "cv", "cn")
    val eb = banded(evalSet, "eval_id", "ev", "en")
    val cos = when(col("cn") * col("en") === 0.0, 0.0)
      .otherwise(vecDot(col("cv"), col("ev")) / (col("cn") * col("en")))
    cb.join(broadcast(eb), Seq("band_idx", "band_key"))
      .select(col("id"), col("eval_id"), col("cv"), col("ev"),
        col("cn"), col("en"))
      .distinct()
      .select(col("id"), col("eval_id"), cos.as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("id"))
      .agg(countDistinct(col("eval_id")).as("n_eval_hits"),
        max(col("cos")).as("max_cos"))
  }
}
