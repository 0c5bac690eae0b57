package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}
import graft.functions.expressions.DotProduct.vecDot

class ProductQuantizerSpec extends GraftTestBase {

  private lazy val emb = Tables(spark, sf001)("embeddings")
  private lazy val model =
    ProductQuantizer.fit(emb, "vec_id", "embedding", dim = 64,
      m = 8, codes = 16, iters = 3)

  test("codes are m small ints and encoding is deterministic") {
    val e1 = ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    val e2 = ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    assert(e1.exceptAll(e2).isEmpty)
    val shapes = e1.select(size(col("codes")).as("m"),
        array_max(col("codes")).as("mx"), array_min(col("codes")).as("mn"))
      .agg(min("m"), max("m"), max("mx"), min("mn")).collect().head
    assert(shapes.getInt(0) == 8 && shapes.getInt(1) == 8)
    assert(shapes.getInt(2) < 16 && shapes.getInt(3) >= 0)
  }

  test("quantization error is well below the vector norm") {
    val enc = ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    val dec = ProductQuantizer.decode(enc, model)
    val joined = emb.select(col("vec_id").as("vid"),
        col("embedding").cast("array<double>").as("v"))
      .join(dec, "vid")
    val errOverNorm = joined.select(
        (sqrt(vecDot(expr("zip_with(v, approx_v, (a, b) -> a - b)"),
                     expr("zip_with(v, approx_v, (a, b) -> a - b)"))) /
         sqrt(vecDot(col("v"), col("v")))).as("rel"))
      .agg(avg("rel"), max("rel")).collect().head
    assert(errOverNorm.getDouble(0) < 0.9,
      s"mean relative error ${errOverNorm.getDouble(0)} — quantizer learned nothing")
    assert(errOverNorm.getDouble(1) <= 1.2)
  }

  test("ADC top-k recall is high on clustered data, nonzero on random") {
    // Clustered corpus: 10 tight clusters (cluster signal ≫ point noise);
    // exact euclidean neighbors are cluster mates, which a working PQ
    // must preserve. The sf testdata embeddings are structureless random
    // vectors — the worst case for ANY quantizer (same caveat as SRP,
    // see SimilaritySpec) — so the meaningful floor is asserted here and
    // only a weak one on the random corpus.
    val pts = spark.range(500).select(col("id").as("vec_id"),
      expr("""transform(sequence(1, 64),
                i -> sin((id % 10) * 7.0 + i) + 0.05 * sin(id * 131.0 + i * 17.0))""")
        .as("vec"))
    def recallOf(corpus: org.apache.spark.sql.DataFrame, vecCol: String,
                 m: ProductQuantizer.Model): Double = {
      val queries = corpus.filter(col("vec_id") < 10)
      val enc = ProductQuantizer.encode(corpus, "vec_id", vecCol, m)
      val approx = ProductQuantizer.adcTopK(enc, queries, "vec_id", vecCol,
        m, k = 10)
      val c = corpus.select(col("vec_id").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      val q = queries.select(col("vec_id").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      val d2 = vecDot(expr("zip_with(qv, cv, (a, b) -> a - b)"),
                      expr("zip_with(qv, cv, (a, b) -> a - b)"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("d2").asc, col("neighbor_id"))
      val exact = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), d2.as("d2"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      val ex = exact.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ap = approx.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ex.intersect(ap).size.toDouble / ex.size
    }

    val clusteredModel = ProductQuantizer.fit(pts, "vec_id", "vec", dim = 64,
      m = 8, codes = 16, iters = 3)
    val clusteredRecall = recallOf(pts, "vec", clusteredModel)
    assert(clusteredRecall >= 0.7,
      s"ADC recall@10 on clustered data = $clusteredRecall")

    val randomRecall = recallOf(emb, "embedding", model)
    assert(randomRecall > 0.05,
      s"ADC recall@10 on random data = $randomRecall — even the random floor failed")
  }
}
