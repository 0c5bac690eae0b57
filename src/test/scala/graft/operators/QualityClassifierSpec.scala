package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class QualityClassifierSpec extends GraftTestBase {
  import spark.implicits._

  test("scores separate prose from spam and respect the sigmoid bounds") {
    val docs = Seq(
      (1L, "the cat sat of the mat and looked out to the garden while " +
        "the rain fell softly over a quiet town of old houses"),
      (2L, "buy buy buy buy buy buy buy buy buy buy buy buy buy buy"),
      (3L, ";;;;;;;; !!!! ???? ;;;; .... ,,,, :::: !!!! ;;;; ????"))
      .toDF("doc_id", "text")
    val out = QualityClassifier.filter(docs, "text")
      .select("doc_id", "quality_score", "kept")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    out.values.foreach { case (s, _) => assert(s > 0.0 && s < 1.0) }
    // prose scores above repetition spam and punctuation noise
    assert(out(1L)._1 > out(2L)._1)
    assert(out(1L)._1 > out(3L)._1)
    assert(out(1L)._2 == 1, "prose must pass the default gate")
    assert(out(3L)._2 == 0, "punctuation noise must fail the default gate")
  }

  test("scoring is one row-local projection (no shuffles, no joins)") {
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val plan = QualityClassifier.filter(docs, "text")
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }

  test("threshold moves the gate monotonically") {
    val docs = graft.Tables(spark, sf001)("documents")
    val loose = QualityClassifier.filter(docs, "text", threshold = 0.3)
      .filter(col("kept") === 1).count()
    val strict = QualityClassifier.filter(docs, "text", threshold = 0.7)
      .filter(col("kept") === 1).count()
    assert(loose >= strict)
    // the default model is a real discriminator on the corpus: both
    // classes occur at the 0.5 gate
    val mid = QualityClassifier.filter(docs, "text")
    assert(mid.filter(col("kept") === 1).count() > 0)
  }
}
