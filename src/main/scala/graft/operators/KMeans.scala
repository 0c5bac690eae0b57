package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.expressions.DotProduct.vecDot

/** Distributed Lloyd's k-means over an embedding column — the trainer
  * for [[Similarity.ivfTopK]]'s centroid table (IVF coarse quantizer).
  *
  * Spark-shaped iteration:
  *   - centroids live driver-side between iterations (k × dim doubles —
  *     trivially small) and enter each step as a broadcast literal
  *     table, so the corpus NEVER shuffles for assignment;
  *   - assignment = crossJoin(corpus, broadcast centroids) scoring
  *     −2·v·c + |c|² with the codegen'd [[vecDot]] (the |v|² term is
  *     constant per vector, added back only for inertia), argmin via
  *     min(struct(dist, cid)) so ties break to the lowest id
  *     deterministically;
  *   - update = posexplode of assigned vectors → per-(cluster, dim)
  *     mean → per-cluster mean vector: two map-side-combinable
  *     aggregates, state bounded by k × dim, not corpus size;
  *   - empty clusters keep their previous centroid (full-outer
  *     coalesce), so k never silently shrinks.
  *
  * Initialization is deterministic: the k vectors with the smallest
  * md5(id) — reproducible under retries, no RNG state to ship.
  * Returns (centroids DataFrame (centroid_id, centroid), inertia per
  * iteration — the training curve, non-increasing by Lloyd's
  * guarantee).
  */
object KMeans {

  /** `computeInertia = false` skips the per-iteration inertia aggregate
    * — a full extra pass over the assignment per iteration that only
    * matters when the caller wants the training curve (the spec does;
    * the PQ / IVF-PQ fits don't). Centroids are identical either way. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int,
          computeInertia: Boolean = true): (DataFrame, Seq[Double]) = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val spark = df.sparkSession
    // Cached for the whole fit: the seed query plus every iteration's
    // assignment, inertia, and update jobs re-scan this frame — without
    // the cache a 3-iteration fit reads (and recomputes any upstream
    // projection of) the corpus ~10 times. Values are unchanged; this
    // is the same iterative-input caching PageRank/Hits do.
    val vecs = df
      .select(col(idCol).cast("long").as("vid"),
              col(vecCol).cast("array<double>").as("v"))
      .withColumn("vnorm2", vecDot(col("v"), col("v")))
      .cache()

    // deterministic seed: k smallest md5(vid)
    var centroids: Seq[(Long, Seq[Double])] = vecs
      .withColumn("h", md5(col("vid").cast("string")))
      .orderBy(col("h"), col("vid")).limit(k)
      .select(col("v")).collect()
      .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](0)) }
      .toSeq

    val inertia = Seq.newBuilder[Double]

    (1 to iters).foreach { _ =>
      // Assignment. Literal path (k within the inlined-literal bound):
      // centroids bake into one argmin-struct expression, so assignment
      // is a ROW-LOCAL narrow projection — no crossJoin, no per-
      // iteration groupBy(vid) shuffle; the only exchange left per
      // iteration is the (cid, pos) update aggregate. The expression
      // computes the identical (reldist, cid) doubles as the join form
      // (same vecDot order, same Σx² centroid norm, same struct-min
      // tie-break to the lowest id), so results are bit-equal — the
      // golden oracles (q346/q358) pin that. Beyond the literal bound,
      // fall back to the broadcast crossJoin form.
      val assigned =
        if (centroids.size <= Similarity.MaxLiteralCentroids) {
          val scores = array(centroids.map { case (cid, c) =>
            val cn2 = c.map(x => x * x).sum
            struct(
              (lit(-2.0) * vecDot(col("v"), typedLit(c)) + lit(cn2))
                .as("reldist"),
              lit(cid).as("centroid_id"))
          }: _*)
          vecs.withColumn("best", array_min(scores))
            .select(col("vid"), col("v"),
              col("best.centroid_id").as("cid"),
              (col("best.reldist") + col("vnorm2")).as("dist2"))
        } else {
          val centDf = broadcast(centroidsDf(spark, centroids)
            .withColumn("cnorm2", vecDot(col("centroid"), col("centroid"))))
          vecs.crossJoin(centDf)
            .withColumn("reldist",
              lit(-2.0) * vecDot(col("v"), col("centroid")) + col("cnorm2"))
            .groupBy(col("vid"))
            .agg(min(struct(col("reldist"), col("centroid_id"))).as("best"),
                 first(col("v")).as("v"), first(col("vnorm2")).as("vnorm2"))
            .select(col("vid"), col("v"),
              col("best.centroid_id").as("cid"),
              (col("best.reldist") + col("vnorm2")).as("dist2"))
        }

      if (computeInertia)
        inertia += assigned.agg(sum(col("dist2"))).head.getDouble(0)

      // per-(cluster, dim) mean, assembled into vectors on the driver —
      // k × dim rows, one shuffle (the former second groupBy added an
      // exchange + collect_list job for what is a tiny driver-side zip)
      val updated = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_._2).map(_._3).toSeq
        }

      // empty clusters keep their previous centroid
      centroids = centroids.map { case (cid, old) =>
        (cid, updated.getOrElse(cid, old))
      }
    }

    vecs.unpersist()
    (centroidsDf(spark, centroids), inertia.result())
  }

  /** Driver-side Lloyd's over a BOUNDED sample — the fit twin used by
    * [[IvfPq.fit]]: at scale a quantizer is trained on O(50·k) rows,
    * and at that size the distributed loop's cost is pure job-scheduling
    * overhead (dozens of tiny jobs), so the sample fits locally in
    * microseconds. Same math as the distributed path: seed = k smallest
    * md5(id) (ordered (md5, id)), argmin of −2·v·c + |c|² with ties to
    * the lowest centroid, per-cluster mean update, empty clusters keep
    * their previous centroid. STRONGER determinism than the distributed
    * form: accumulation runs in fixed ascending-id order, so results
    * are bit-stable under any upstream partitioning by construction
    * (no q346-style summation-order knife-edge).
    * Returns min(k, n) centroids ordered by centroid id. */
  def fitLocal(rows: IndexedSeq[(Long, Array[Double])], k: Int,
               iters: Int): Array[Array[Double]] = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    require(rows.nonEmpty, "empty sample")
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5Hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    var cents: Array[Array[Double]] = rows
      .sortBy { case (id, _) => (md5Hex(id.toString), id) }
      .take(k).map(_._2.clone()).toArray
    val data = rows.sortBy(_._1) // fixed accumulation order
    val dim = data.head._2.length
    (1 to iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      data.foreach { case (_, v) =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val cc = cents(c)
          var dot = 0.0
          var cn2 = 0.0
          var i = 0
          while (i < dim) { dot += v(i) * cc(i); cn2 += cc(i) * cc(i); i += 1 }
          val d = -2.0 * dot + cn2
          if (d < bestD) { bestD = d; best = c } // strict <: ties keep lowest id
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c) else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  private def centroidsDf(spark: SparkSession,
                          cs: Seq[(Long, Seq[Double])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("centroid_id", LongType, nullable = false),
      StructField("centroid", ArrayType(DoubleType, containsNull = false))))
    spark.createDataFrame(
      java.util.Arrays.asList(cs.map(c => Row(c._1, c._2)): _*), schema)
  }
}
