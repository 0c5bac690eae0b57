package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.functions.expressions.{ChunkSplit, DotProduct, MinHashSignature, RollingHash, SasToDate, SimHash64}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT sas_to_date(arrdate) ...")` works alongside the
  * Column API (the reference exposes both surfaces, SURVEY.md §3.3).
  * Every custom Expression the engine ships is reachable from SQL:
  * sas_to_date, vec_dot, simhash64, minhash_signature, rolling_hash. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "sas_to_date", exprs => SasToDate.fromAny(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct.fromAny(exprs.head, exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "simhash64",
      exprs => SimHash64(Cast(exprs.head, ArrayType(StringType))), "scala_udf")
    registry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSignature(
        Cast(exprs.head, ArrayType(StringType)), intLit(exprs(1), "minhash_signature k")),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "rolling_hash",
      exprs => RollingHash(Cast(exprs.head, StringType),
                           base = 131L, mod = MinHashSignature.P), "scala_udf")
    registry.createOrReplaceTempFunction(
      "minhash_from_hashes",
      exprs => graft.functions.expressions.MinHashFromHashes(
        Cast(exprs.head, ArrayType(org.apache.spark.sql.types.LongType)),
        intLit(exprs(1), "minhash_from_hashes k")),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "shingle_minhash",
      exprs => graft.functions.expressions.ShingleMinHash(
        Cast(exprs.head, StringType),
        intLit(exprs(1), "shingle_minhash shingleLen"),
        intLit(exprs(2), "shingle_minhash k")),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "text_simhash",
      exprs => graft.functions.expressions.TextSimHash(
        Cast(exprs.head, StringType)),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "unicode_normalize",
      exprs => graft.functions.expressions.UnicodeNormalize(
        Cast(exprs.head, StringType),
        exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, StringType) =>
            v.toString.toUpperCase
          case other => throw new IllegalArgumentException(
            s"unicode_normalize form must be a string literal, got $other")
        }),
      "scala_udf")
    // table-generating function (UDTF): LATERAL VIEW chunk_split(text, n)
    // ("scala_udf" is only the error-message label — the returned
    // Generator expression is what makes this a UDTF to the analyzer)
    registry.createOrReplaceTempFunction(
      "chunk_split",
      exprs => ChunkSplit(Cast(exprs.head, StringType), exprs(1)), "scala_udf")
    // typed Aggregator surfaced as a SQL UDAF: partial-aggregating,
    // map-side-combinable like any built-in agg
    spark.udf.register("weighted_avg",
      org.apache.spark.sql.functions.udaf(WeightedAvg))
    // native DeclarativeAggregate twin (whole-stage codegen; the
    // analyzer wraps a bare AggregateFunction in AggregateExpression)
    registry.createOrReplaceTempFunction(
      "weighted_avg_native",
      exprs => graft.functions.expressions.WeightedAverage(
        Cast(exprs.head, org.apache.spark.sql.types.DoubleType),
        Cast(exprs(1), org.apache.spark.sql.types.DoubleType)),
      "scala_udf")
  }

  /** Static-int argument (k): must be a foldable, NON-NULL int literal
    * (a null literal would unbox to k=0 and silently produce empty
    * signatures). */
  private def intLit(e: Expression, what: String): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"$what must be an INT literal")
    val v = e.eval()
    require(v != null, s"$what must not be NULL")
    v.asInstanceOf[Int]
  }
}
