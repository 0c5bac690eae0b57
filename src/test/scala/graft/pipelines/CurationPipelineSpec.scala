package graft.pipelines

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}
import graft.functions.TextFunctions

class CurationPipelineSpec extends GraftTestBase {

  private lazy val (packed, funnel) =
    CurationPipeline.run(spark, Tables(spark, sf001)("documents"))

  test("funnel is monotone and reports every stage") {
    assert(funnel.map(_.stage) == Seq("input", "exact_dedup", "near_dedup",
      "decontaminate", "quality_gate", "repetition_gate", "domain_cap",
      "hash_sample"))
    assert(funnel.sliding(2).forall { case Seq(a, b) => b.docs <= a.docs })
    assert(funnel.head.docs == 500) // sf0.001 documents
    assert(funnel.last.docs > 0, "pipeline filtered everything out")
  }

  test("domain cap bounds per-source counts and keeps determinism") {
    val (cappedRun, f) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"), domainCap = 5L)
    val perSource = cappedRun.groupBy("source").count().collect()
    assert(perSource.nonEmpty && perSource.forall(_.getAs[Long]("count") <= 5))
    assert(f.find(_.stage == "domain_cap").get.docs <=
           f.find(_.stage == "repetition_gate").get.docs)
    val (cappedAgain, _) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"), domainCap = 5L)
    assert(cappedRun.exceptAll(cappedAgain).isEmpty)
  }

  test("repetition gate drops a synthetic highly-repetitive doc") {
    import spark.implicits._
    val repetitive = ("x y " * 200).trim  // one distinct 2-gram pair
    val docs = Tables(spark, sf001)("documents")
      .unionByName(Seq((100001L, repetitive, "en", "srcX", repetitive.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val (out, f) = CurationPipeline.run(spark, docs)
    assert(out.filter(col("doc_id") === 100001L).count() == 0,
      "repetitive doc survived the gate")
    // and the stage (not an earlier one) dropped it: it reaches quality
    assert(f.find(_.stage == "quality_gate").get.docs >
           f.find(_.stage == "repetition_gate").get.docs)
  }

  test("output carries no exact duplicates and no benchmark docs") {
    val out = packed.cache()
    val fps = out.select(TextFunctions.fingerprint(col("text")).as("fp"))
    assert(fps.count() == fps.distinct().count(), "exact dups survived")
    assert(out.filter(pmod(col("doc_id"), lit(97)) === 0).count() == 0,
      "benchmark docs leaked into the corpus")
  }

  test("bins respect the token budget given each doc fits it") {
    // cumsum packing guarantees: every bin's token total stays under
    // budget + the largest single doc (a doc bigger than the budget
    // gets its own bin). With sf0.001 docs well under 512 tokens, each
    // bin except a language's last must be CLOSE to full too.
    val bins = packed.groupBy(col("lang"), col("bin"))
      .agg(sum(col("tok")).as("total"), max(col("tok")).as("biggest"))
    val over = bins.filter(col("total") > lit(512) + col("biggest"))
    assert(over.count() == 0, "a bin exceeds budget + one document")
  }

  test("packing is deterministic across runs") {
    val (again, _) = CurationPipeline.run(spark, Tables(spark, sf001)("documents"))
    assert(packed.exceptAll(again).isEmpty && again.exceptAll(packed).isEmpty)
  }
}
