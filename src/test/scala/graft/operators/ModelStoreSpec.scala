package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** The persisted-model contract: fit → save → load must reproduce the
  * fitted artifact EXACTLY (parquet round-trips doubles bit-for-bit,
  * load re-orders by stored ids), so every downstream assignment,
  * encode, probe, and score is identical whether it serves from the
  * fresh fit or from disk — the "train once, apply many" invariant
  * q480 additionally pins end-to-end against q358's golden. */
class ModelStoreSpec extends GraftTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("IVF-PQ model round-trips bit-exactly and serves identical results") {
    val all = Tables(spark, sf001)("embeddings")
    val model = IvfPq.fit(all, "vec_id", "embedding",
      dim = 64, coarseK = 4, m = 4, codes = 8, iters = 2)
    val path = tmp("ms_ivfpq_")
    ModelStore.saveIvfPq(spark, model, path)
    val loaded = ModelStore.loadIvfPq(spark, path)
    // the artifact itself is value-identical (doubles bit-exact)
    assert(loaded == model)
    // and a full encode+probe from the loaded model matches row-for-row
    val queries = all.filter(col("vec_id") < 5)
    def serve(m: IvfPq.Model) =
      IvfPq.topK(IvfPq.encode(all, "vec_id", "embedding", m),
          queries, "vec_id", "embedding", m, k = 3, nprobe = 2)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(serve(loaded) == serve(model))
  }

  test("centroid table round-trips in centroid_id order") {
    val all = Tables(spark, sf001)("embeddings")
    val (cents, _) = KMeans.fit(all, "vec_id", "embedding", k = 4, iters = 2,
      computeInertia = false)
    val path = tmp("ms_cent_")
    ModelStore.saveCentroids(cents, path)
    val loaded = ModelStore.loadCentroids(spark, path)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val orig = cents.orderBy("centroid_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(loaded == orig)
  }

  test("logistic weights round-trip with names and positions intact") {
    val names = Seq("len_sat", "stopword_ratio", "punct_share", "ttr")
    val w = Seq(-1.25, 2.5, 6.125, -8.0625, 1.5)
    val path = tmp("ms_logit_")
    ModelStore.saveLogistic(spark, names, w, path)
    val (loadedNames, loadedW) = ModelStore.loadLogistic(spark, path)
    assert(loadedNames == names)
    assert(loadedW == w)
  }

  test("BPE merge table round-trips in rank order and serves identical segmentations") {
    val d = Tables(spark, sf001)("documents")
    val merges = BpeTrainer.train(d, "text", merges = 4)
    val path = tmp("ms_bpe_")
    ModelStore.saveBpe(merges, path)
    val loaded = ModelStore.loadBpe(spark, path)
    val orig = merges.orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(loaded == orig)
    // persisted-serve ≡ fresh-serve on the segmentation itself
    val fresh = BpeTrainer.segment(d, "text", merges = 4)
      .orderBy("word").collect().map(_.toSeq).toSeq
    val served = BpeTrainer.segmentWith(d, "text",
        loaded.map { case (_, l, r, _) => (l, r) })
      .orderBy("word").collect().map(_.toSeq).toSeq
    assert(served == fresh)
  }

  test("KN model round-trips and scores bit-identically from the loaded tables") {
    val d = Tables(spark, sf001)("documents")
    val model = KnLm.fit(d, "doc_id", "text")
    val path = tmp("ms_kn_")
    ModelStore.saveKnLm(model, path)
    val loaded = ModelStore.loadKnLm(spark, path)
    def scores(m: KnLm.Model) =
      KnLm.score(d, "doc_id", "text", m)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(scores(loaded) == scores(model))
  }

  test("loading the wrong artifact kind fails loudly") {
    val path = tmp("ms_kind_")
    ModelStore.saveLogistic(spark, Seq("f"), Seq(0.5, 1.5), path)
    val e = intercept[IllegalArgumentException] {
      ModelStore.loadIvfPq(spark, path)
    }
    assert(e.getMessage.contains("expected 'ivfpq'"))
  }

  test("weight/feature arity mismatch is rejected at save time") {
    intercept[IllegalArgumentException] {
      ModelStore.saveLogistic(spark, Seq("a", "b"), Seq(1.0, 2.0), tmp("ms_ar_"))
    }
  }

  test("isotonic step calibrator round-trips in bin order") {
    val steps = Seq(0.05, 0.1, 0.1, 0.25, 0.25, 0.25, 0.5, 0.875, 0.9, 1.0)
    val path = tmp("ms_iso_")
    ModelStore.saveIsotonic(spark, steps, path)
    assert(ModelStore.loadIsotonic(spark, path) == steps)
    intercept[IllegalArgumentException] {
      ModelStore.saveIsotonic(spark, Seq(0.1, 0.2), tmp("ms_isobad_"))
    }
  }

  test("training-time score histogram round-trips through the manifest") {
    val names = Seq("f1")
    val w = Seq(0.25, -1.5)
    val hist = Seq(0L, 3L, 0L, 12L, 7L, 0L, 0L, 950L, 21L, 4L)
    val path = tmp("ms_hist_")
    ModelStore.saveLogistic(spark, names, w, path, hist)
    assert(ModelStore.loadLogisticHist(spark, path) == hist)
    // weights are untouched by the extra manifest key
    assert(ModelStore.loadLogistic(spark, path) == ((names, w)))
    // an artifact without the field reads back as "not recorded"
    val bare = tmp("ms_nohist_")
    ModelStore.saveLogistic(spark, names, w, bare)
    assert(ModelStore.loadLogisticHist(spark, bare).isEmpty)
    // and a non-decile histogram is rejected at save time
    intercept[IllegalArgumentException] {
      ModelStore.saveLogistic(spark, names, w, tmp("ms_badh_"), Seq(1L, 2L))
    }
  }
}
