package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** The optimizer rule must fire on the composed dot pattern (visible in
  * the optimized plan as vec_dot) without changing results, and must
  * leave non-matching aggregates untouched. */
class GraftExtensionsSpec extends AnyFunSuite {

  // Extensions are builder-time configuration, and getOrCreate() would
  // silently return another suite's session (ignoring withExtensions) in
  // the shared test JVM — clear the active/default session first so a
  // fresh extension-bearing session builds over the existing context.
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.GraftSession.builder(4)
      .withExtensions(new GraftExtensions)
      .appName("graft-ext")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("composed higher-order dot is rewritten to native vec_dot, same results") {
    import spark.implicits._
    val df = graft.Tables(spark, "/root/testdata/sf0.001")("embeddings")
      .limit(50)
      .select($"vec_id", VectorFunctions.dot($"embedding", $"embedding").as("d"))

    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), s"rule did not fire:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"),
      "composed form should be gone")

    // results identical to a session WITHOUT the rule (same rows)
    val plainSession = graft.GraftSession.local(4)
    val want = graft.Tables(plainSession, "/root/testdata/sf0.001")("embeddings")
      .limit(50)
      .select(org.apache.spark.sql.functions.col("vec_id"),
              VectorFunctions.dot(
                org.apache.spark.sql.functions.col("embedding"),
                org.apache.spark.sql.functions.col("embedding")).as("d"))
      .collect().map(_.toString).sorted
    val got = df.collect().map(_.toString).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("rewrite preserves null semantics: mismatched lengths and null elements") {
    import spark.implicits._
    // the rewritten vec_dot must return NULL exactly where the composed
    // zip_with∘aggregate form does — mismatch pads with null, a null
    // element poisons the fold, a null input propagates. Built over a
    // parquet scan because local relations are evaluated away by the
    // optimizer (ConvertToLocalRelation) before the plan can be
    // inspected.
    import org.apache.spark.sql.functions.expr
    val e = graft.Tables(spark, "/root/testdata/sf0.001")("embeddings").limit(5)
    val df = e.select(
      VectorFunctions.dot($"embedding", expr("slice(embedding, 1, 63)")).as("mism"),
      VectorFunctions.dot(
        expr("transform(embedding, (x, i) -> IF(i = 0, CAST(NULL AS FLOAT), x))"),
        $"embedding").as("nelem"),
      VectorFunctions.dot(expr("IF(vec_id < 0, embedding, NULL)"), $"embedding")
        .as("ninput"),
      VectorFunctions.dot($"embedding", $"embedding").as("ok"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("vec_dot".r.findAllIn(optimized).size >= 4,
      s"rule must fire on ALL FOUR columns (else the composed form, which is\n" +
      s"null-correct anyway, would mask an untested native path):\n$optimized")
    df.collect().foreach { r =>
      assert(r.isNullAt(0), "length mismatch must be NULL")
      assert(r.isNullAt(1), "null element must be NULL")
      assert(r.isNullAt(2), "null input must be NULL")
      assert(!r.isNullAt(3) && r.getDouble(3) > 0.0, "clean row must score")
    }
  }

  test("non-matching aggregates are left alone") {
    import spark.implicits._
    // sum-of-elements (not a product zip) must NOT be rewritten
    val df = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "v")
      .selectExpr("aggregate(v, 0.0d, (acc, x) -> acc + x) AS s")
    assert(!df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(df.collect().head.getDouble(0) == 6.0)
  }
}
