package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement
  * (Efraimidis-Spirakis A-Res): every row draws its "uniform" u ∈ (0,1)
  * from an md5 hash of a stable id — reproducible across runs, engines,
  * and cluster topologies, unlike rand() — scores key = u^(1/w), and
  * the k largest keys per stratum win. P(selected) is proportional to
  * weight, the classic reservoir guarantee.
  *
  * Scale shape: one projection + one window over the stratum key —
  * a single shuffle on the strata, no global sort, no driver state.
  * At 100 TB the window's per-stratum sort can be replaced by a
  * bounded-heap top-k aggregator (operators.TopK pattern) — the score
  * column is the only thing that matters, so the two are drop-in
  * equivalent; the window form is kept here because it is oracle-able
  * row-for-row.
  *
  * Reference scope: the capstone samples nothing — this is part of the
  * training-data extension surface (weighted corpus subsetting).
  */
object WeightedSample {

  private val M = 1000003L // prime modulus for the md5-uniform

  /** md5-derived u ∈ (0,1): int64 of the first 8 md5 hex chars of the
    * id, folded mod M into {1..M} then scaled — identical in DuckDB as
    * (('0x'||substr(md5(id),1,8))::BIGINT % 1000003 + 1) / 1000004.0 */
  def uniform(id: Column): Column =
    (pmod(conv(substring(md5(encode(id.cast("string"), "UTF-8")), 1, 8),
      16, 10).cast("long"), lit(M)) + 1) / lit(M + 1).cast("double")

  /** A-Res score u^(1/w); larger is better. Weights must be > 0. */
  def score(id: Column, weight: Column): Column =
    pow(uniform(id), lit(1.0) / weight.cast("double"))

  /** Top-k weighted sample per stratum. Output keeps every input
    * column plus `sample_rank` (1..k by descending score) and
    * `sample_score`. Deterministic: ties (astronomically unlikely with
    * real weights) break on the id. */
  def sample(df: DataFrame, strata: Seq[String], idCol: String,
             weight: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(col("__ws_score").desc, col(idCol).asc)
    df.withColumn("__ws_score", score(col(idCol), weight))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .withColumnRenamed("__ws_score", "sample_score")
  }
}
