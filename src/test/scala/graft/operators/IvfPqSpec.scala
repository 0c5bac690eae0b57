package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.functions.expressions.DotProduct.vecDot

/** IVF-PQ composition contract: bucketed ADC over residual codes must
  * (a) prune the scan to the probed buckets, (b) recover the plain-ADC
  * recall when probing every bucket, and (c) keep the clustered-data
  * recall the PQ spec demands while scanning a fraction of the corpus. */
class IvfPqSpec extends GraftTestBase {

  // same clustered corpus as ProductQuantizerSpec: cluster signal ≫
  // point noise, so exact neighbors are cluster mates and a correct
  // coarse quantizer maps each cluster to few buckets
  private lazy val pts = spark.range(500).select(col("id").as("vec_id"),
    expr("""transform(sequence(1, 64),
              i -> sin((id % 10) * 7.0 + i) + 0.05 * sin(id * 131.0 + i * 17.0))""")
      .as("vec"))

  private lazy val model =
    IvfPq.fit(pts, "vec_id", "vec", dim = 64,
      coarseK = 8, m = 8, codes = 16, iters = 3)
  private lazy val enc = IvfPq.encode(pts, "vec_id", "vec", model)

  private def exactTop10(corpus: DataFrame, vecCol: String): Set[(Long, Long)] = {
    val queries = corpus.filter(col("vec_id") < 10)
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col("vec_id").as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val d2 = vecDot(expr("zip_with(qv, cv, (a, b) -> a - b)"),
                    expr("zip_with(qv, cv, (a, b) -> a - b)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def recallAt(nprobe: Int): Double = {
    val ap = IvfPq.topK(enc, pts.filter(col("vec_id") < 10), "vec_id",
        "vec", model, k = 10, nprobe = nprobe)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = exactTop10(pts, "vec")
    ex.intersect(ap).size.toDouble / ex.size
  }

  test("exact rerank recovers recall the raw ADC ordering loses") {
    val queries = pts.filter(col("vec_id") < 10)
    val ex = exactTop10(pts, "vec")
    def pairs(df: DataFrame) = df.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = pairs(IvfPq.topK(enc, queries, "vec_id", "vec", model,
      k = 10, nprobe = 4))
    val ref = pairs(IvfPq.topKRefined(enc, queries, "vec_id", "vec",
      corpus = pts, model = model, k = 10, kCandidates = 50, nprobe = 4))
    val rAdc = ex.intersect(adc).size.toDouble / ex.size
    val rRef = ex.intersect(ref).size.toDouble / ex.size
    assert(rRef >= rAdc, s"rerank recall $rRef below raw ADC $rAdc")
    // with 50 candidates over clustered data the reranked set should be
    // essentially exact within the probed buckets
    assert(rRef >= 0.9, s"rerank recall $rRef unexpectedly low")
    // and the refined output ranks by exact cosine: ranks are 1..k dense
    val ranks = IvfPq.topKRefined(enc, queries, "vec_id", "vec",
        corpus = pts, model = model, k = 3, kCandidates = 50, nprobe = 4)
      .groupBy("query_id").agg(collect_list("rank").as("rs"))
      .collect().map(_.getSeq[Int](1).sorted)
    assert(ranks.forall(_ == Seq(1, 2, 3)))
  }

  test("encode emits (bucket, codes) with in-range values, deterministically") {
    val shapes = enc.select(col("bucket"), size(col("codes")).as("m"),
        array_max(col("codes")).as("mx"), array_min(col("codes")).as("mn"))
      .agg(min("bucket"), max("bucket"), min("m"), max("m"),
           max("mx"), min("mn")).collect().head
    assert(shapes.getInt(0) >= 0 && shapes.getInt(1) < 8)
    assert(shapes.getInt(2) == 8 && shapes.getInt(3) == 8)
    assert(shapes.getInt(4) < 16 && shapes.getInt(5) >= 0)
    val again = IvfPq.encode(pts.repartition(7), "vec_id", "vec", model)
    assert(enc.exceptAll(again).isEmpty && again.exceptAll(enc).isEmpty)
  }

  test("probing a fraction of buckets keeps clustered recall; full probe >= partial") {
    val partial = recallAt(2)
    val full = recallAt(8)
    assert(partial >= 0.6, s"IVF-PQ recall@10 at nprobe=2 = $partial")
    assert(full >= partial,
      s"probing all buckets ($full) lost recall vs nprobe=2 ($partial)")
    assert(full >= 0.7, s"full-probe recall $full below the plain-ADC bar")
  }

  test("the probe join actually prunes: scored pairs shrink with nprobe") {
    def scanned(nprobe: Int): Long = {
      // count candidate pairs BEFORE the top-k window by re-deriving
      // the probe join (rank filter would hide the pruning)
      val probeCount = IvfPq.topK(enc, pts.filter(col("vec_id") < 10),
        "vec_id", "vec", model, k = 500, nprobe = nprobe).count()
      probeCount
    }
    val narrow = scanned(1)
    val wide = scanned(8)
    assert(narrow < wide,
      s"nprobe=1 scanned $narrow pairs, not fewer than nprobe=8's $wide")
    // 8 buckets over 10 clusters: one probe must visit well under half
    // the corpus on average
    assert(narrow < wide / 2, s"nprobe=1 pruning too weak: $narrow vs $wide")
  }
}
