package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class SimilaritySpec extends GraftTestBase {
  import spark.implicits._

  private val dim = 8

  /** Clustered corpus: two tight clusters + noise, so top-k is
    * predictable: a vector's nearest neighbors are its cluster mates. */
  private def corpus = {
    def v(base: Double*)(jitter: Double) =
      base.toArray.map(x => (x + jitter).toFloat)
    Seq(
      (0L, v(1, 0, 0, 0, 1, 0, 0, 0)(0.00)),
      (1L, v(1, 0, 0, 0, 1, 0, 0, 0)(0.01)),
      (2L, v(1, 0, 0, 0, 1, 0, 0, 0)(0.02)),
      (10L, v(0, 1, 0, 1, 0, 0, 1, 0)(0.00)),
      (11L, v(0, 1, 0, 1, 0, 0, 1, 0)(0.01)),
      (12L, v(0, 1, 0, 1, 0, 0, 1, 0)(0.02)),
      (20L, v(0.5, -1, 0.5, 0, -1, 1, 0, 0.5)(0.0)))
      .toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks cluster mates first") {
    val q = corpus.filter($"vec_id".isin(0L, 10L))
    val top = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("rank")) -> r.getLong(1)).toMap
    assert(Set(top((0L, 1)), top((0L, 2))) == Set(1L, 2L))
    assert(Set(top((10L, 1)), top((10L, 2))) == Set(11L, 12L))
  }

  test("srp ANN recalls cluster mates (identical-direction vectors share all bands)") {
    val q = corpus.filter($"vec_id".isin(0L, 10L))
    val got = Similarity.srpTopK(corpus, q, "vec_id", "embedding",
        k = 2, dim = dim, bits = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("rank")) -> r.getLong(1)).toMap
    assert(Set(got((0L, 1)), got((0L, 2))) == Set(1L, 2L))
  }

  test("srp recall on real embeddings is high at k=5") {
    val all = graft.Tables(spark, sf001)("embeddings")
    val q = all.filter(pmod($"vec_id", lit(50)) === 0)
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.srpTopK(all, q, "vec_id", "embedding", k = 5, dim = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // The synthetic embeddings are STRUCTURELESS random unit vectors, the
    // worst case for LSH (true NNs barely beat the average pair), yet
    // 4x4-bit bands still probe only ~23% of the corpus per query. ~0.48
    // measured; pinned floor 0.4. Chance at k=5/n=500 would be ~0.05.
    // On clustered data (test above) recall is exact.
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("multi-probe srp: recall >= single-probe at the same index size") {
    val all = graft.Tables(spark, sf001)("embeddings")
    val q = all.filter(pmod($"vec_id", lit(50)) === 0)
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      exact.intersect(df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet).size.toDouble / exact.size
    val single = recallOf(
      Similarity.srpTopK(all, q, "vec_id", "embedding", k = 5, dim = 64))
    val multi = recallOf(
      Similarity.srpMultiProbeTopK(all, q, "vec_id", "embedding", k = 5, dim = 64))
    // The probe set contains the exact key, so candidates are a superset
    // and recall cannot drop; on these structureless vectors the 1-bit
    // flips lift it substantially (~0.48 -> ~0.9 measured).
    assert(multi >= single, s"multi=$multi < single=$single")
    assert(multi >= 0.6, s"multi-probe recall=$multi")
  }

  test("q472 registered recall audit: multi-probe >= single-probe at every k") {
    // the oracle-able twin of the operator-level recall pins above —
    // the trust table a user runs before believing the banded kNN legs
    val rows = graft.SparkEntry.queries("q472_ann_recall")(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(4)).toMap
    Seq(1, 5).foreach { k =>
      assert(rows(("srp_multiprobe", k)) >= rows(("srp", k)),
        s"multiprobe recall@$k dropped below single-probe")
    }
    assert(rows.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("directed probes: superset of exact keys, fixed fan-out, budget buys recall cheaply") {
    val all = graft.Tables(spark, sf001)("embeddings")
    val src = all.filter($"label" === 0)
    val exactRows = Similarity.directedProbeRows(src, "vec_id", "embedding",
      dim = 64, probes = 0)
    val probedRows = Similarity.directedProbeRows(src, "vec_id", "embedding",
      dim = 64, probes = 16)
    // probe rows ⊇ exact rows (the sequence adds keys, never replaces)
    assert(exactRows.exceptAll(probedRows).isEmpty)
    // fixed per-vector fan-out: bands + probes rows each
    val perVec = probedRows.groupBy("vec_id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSeq
    assert(perVec == Seq(6 + 16), s"fan-out $perVec")
    // the measured trade on the bitext audit: recall nearly doubles vs
    // single probe while the candidate fraction stays around 0.3 (the
    // sf0.001 target collection is 47 vectors — one missed pair is 2pp
    // of recall — hence the floor here sits below q435's sf0.01+ 0.6)
    val r = graft.SparkEntry.queries("q435_directed_probe_bitext")(spark, sf001)
      .collect().head
    assert(r.getAs[Double]("recall") >= 0.5,
      s"recall ${r.getAs[Double]("recall")}")
    assert(r.getAs[Double]("cand_frac") <= 0.35,
      s"cand_frac ${r.getAs[Double]("cand_frac")}")
  }

  test("ivf ANN: nprobe=all buckets degenerates to exact brute-force top-k") {
    // With every bucket probed, IVF must return exactly the brute-force
    // result — the approximation comes ONLY from unprobed buckets.
    val all = graft.Tables(spark, sf001)("embeddings")
    val q = all.filter(pmod($"vec_id", lit(50)) === 0)
    val cent = all.filter($"vec_id" < 16)
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val ivfAll = Similarity.ivfTopK(all, q, "vec_id", "embedding", k = 5,
        centroids = cent, centroidIdCol = "vec_id", nprobe = 16)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(ivfAll == exact)
  }

  test("ivf recall on real embeddings beats probed-fraction chance at nprobe=2") {
    val all = graft.Tables(spark, sf001)("embeddings")
    val q = all.filter(pmod($"vec_id", lit(50)) === 0)
    val cent = all.filter($"vec_id" < 16)
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(all, q, "vec_id", "embedding", k = 5,
        centroids = cent, centroidIdCol = "vec_id", nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // Structureless random vectors are IVF's worst case too (buckets
    // barely correlate with true NNs); probing 2/16 of the corpus must
    // still beat the 12.5% probed-fraction baseline with headroom.
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("near-dup pairs respect the blocking column") {
    val df = corpus.withColumn("label", (col("vec_id") / 10).cast("int"))
    val pairs = Similarity.nearDupPairs(df, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("semantic dedup: centroid buckets recover the clusters, no cross-cluster pairs") {
    // centroids = one exemplar per cluster (0 and 10); every vector
    // must land in its cluster's bucket and only within-cluster pairs
    // can surface — the learned-blocking twin of the label test above
    val cents = corpus.filter(col("vec_id").isin(0L, 10L))
    val out = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        cents, "vec_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = out.map(t => (t._2, t._3)).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L), (11L, 12L)))
    // and each pair's bucket is its cluster's exemplar centroid
    assert(out.forall { case (bkt, a, _) => bkt == (if (a < 10) 0L else 10L) })
  }

  test("semantic dedup composes with a real KMeans fit on real embeddings") {
    val emb = graft.Tables(spark, sf001)("embeddings")
    val (cents, inertia) = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(inertia.size == 3 && inertia.sliding(2).forall(p => p(1) <= p.head + 1e-6))
    val pairs = Similarity.semanticDedup(emb, "vec_id", "embedding",
        cents.withColumnRenamed("centroid", "embedding"),
        "centroid_id", threshold = 0.3)
    // sanity: pairs exist, are canonical (a < b), and every surfaced
    // cosine really clears the threshold when recomputed exactly
    val got = pairs.collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getLong(1) < r.getLong(2)))
    assert(got.forall(r => r.getDouble(3) >= 0.3))
    // learned blocking really blocks: fewer pairs than all-pairs at τ
    val n = emb.count()
    assert(got.length < n * (n - 1) / 2)
  }

  test("SRP near-dup hot-bucket cap kills an identical-embedding flood") {
    import spark.implicits._
    val dim = 8
    val boiler = (0 until dim).map(d => 1.0 + 0.1 * d)
    val cold = (0 until dim).map(d => if (d % 2 == 0) 1.0 else -1.0)
    val rows = (100L until 400L).map(i => (i, boiler)) ++
      Seq((1L, cold), (2L, cold.map(_ * 1.01)))
    val df = rows.toDF("vec_id", "embedding")
    val capped = Similarity.nearDupPairsSrp(df, "vec_id", "embedding",
        threshold = 0.9, dim = dim, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
    // uncapped slice: the flood really pairs (cap is live behavior)
    val slice = df.filter($"vec_id".between(100L, 109L))
    val un = Similarity.nearDupPairsSrp(slice, "vec_id", "embedding",
        threshold = 0.9, dim = dim).collect()
    assert(un.length == 10 * 9 / 2)
  }

  test("embedding decontamination flags a planted near-copy of an eval row") {
    import spark.implicits._
    val dim = 8
    def v(seed: Int): Seq[Double] =
      (0 until dim).map(d => math.sin(seed * 31 + d * 7).abs + 0.1)
    // corpus row 1 = exact copy of eval row 100; row 2 = slight
    // paraphrase (cos ~1); row 3 = orthogonal-ish noise
    val evalSet = Seq((100L, v(5))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, v(5)),
      (2L, v(5).zipWithIndex.map { case (x, i) => x * (1.0 + 0.01 * i) }),
      (3L, (0 until dim).map(d => if (d % 2 == 0) 2.0 else -2.0).map(_.toDouble)))
      .toDF("vec_id", "embedding")
    val out = Similarity.decontaminateByEmbedding(corpus, evalSet,
        "vec_id", "embedding", threshold = 0.95, dim = dim)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.contains(1L) && out(1L)._2 > 0.9999)
    assert(out.contains(2L) && out(2L)._2 >= 0.95)
    assert(!out.contains(3L))
  }
}
