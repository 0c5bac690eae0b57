package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for release pipelines: k-anonymity auditing /
  * suppression and a deterministic differentially-private count
  * release.
  *
  * Both are single-shuffle group-by shapes — the quasi-identifier (or
  * release key) is the only exchange key, so they scale like any
  * hash-aggregate: 100 TB in, one shuffle of (qid, partial count).
  *
  * The DP noise is Laplace via inverse-CDF over an md5-derived uniform
  * (same deterministic-uniform discipline as the q76/q289 samplers):
  * u = first-8-hex(md5(key || salt)) / 2³², noise = −b·sgn(u−½)·
  * ln(1−2|u−½|). Determinism is what makes the release AUDITABLE —
  * the same key and salt always release the same value, the noise
  * can be value-pinned by an oracle, and re-runs cannot silently
  * re-randomize a published statistic. (A fresh salt per release
  * epoch restores the privacy of true randomness; ε accounting is the
  * caller's policy either way.)
  *
  * Reference scope: the reference publishes raw aggregates only; this
  * extends the curation surface alongside PII scrubbing (q78).
  */
object Anonymize {

  /** Per-group k-anonymity profile over the given quasi-identifiers:
    * (qids..., group_n, at_risk) where at_risk marks groups smaller
    * than k — the rows a release would have to suppress or generalize. */
  def kAnonymityProfile(df: DataFrame, qids: Seq[String], k: Int): DataFrame =
    df.groupBy(qids.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", (col("group_n") < k).cast("int"))

  /** k-suppression: drop every row whose quasi-identifier group has
    * fewer than k members. One shuffle on the qid (the profile), then
    * a broadcast-able anti-join of the (rare) at-risk groups back
    * against the data — at 100 TB the at-risk group list is the small
    * side by construction (it is the tail of the group-size
    * distribution), so the data itself never reshuffles.
    *
    * The anti-join is NULL-SAFE (`<=>`): groupBy treats NULL as a
    * group, so an at-risk group whose quasi-identifier contains NULL
    * must still match back — a plain equality join would let exactly
    * the rarest (hence most identifying) rows slip through suppression. */
  def kSuppress(df: DataFrame, qids: Seq[String], k: Int): DataFrame =
    kSuppressGroups(df, qids,
      kAnonymityProfile(df, qids, k).filter(col("at_risk") === 1))

  /** [[kSuppress]] against a precomputed at-risk profile slice — use
    * when the caller already materialized [[kAnonymityProfile]] so the
    * dominant qid shuffle runs once, not twice. */
  def kSuppressGroups(df: DataFrame, qids: Seq[String],
                      riskyGroups: DataFrame): DataFrame = {
    val risky = riskyGroups
      .select(qids.map(q => col(q).as(s"__r_$q")): _*)
    val cond = qids.map(q => df(q) <=> risky(s"__r_$q")).reduce(_ && _)
    df.join(broadcast(risky), cond, "left_anti")
  }

  /** Deterministic uniform in [0, 1) from a release key: first 8 hex
    * chars of md5(key-salt) as a 32-bit integer over 2³². */
  def md5Uniform(key: Column, salt: String): Column =
    conv(substring(md5(concat_ws("-", key, lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Laplace(scale b) noise via inverse CDF over [[md5Uniform]]. The
    * ln argument is floored at 2⁻³² (the uniform's own granularity):
    * u = 0 exactly — probability 2⁻³² per key, a certainty across
    * billions of release groups — would otherwise emit ±Infinity.
    * Caps |noise| at 32·ln2·b ≈ 22·b, far outside any useful tail.
    * NOTE: null keys hash as concat_ws skips them (the bare salt), so
    * a null group still gets deterministic noise — but give release
    * keys a non-null encoding if null is a real category. */
  def laplaceNoise(key: Column, salt: String, b: Double): Column = {
    val u = md5Uniform(key, salt) - lit(0.5)
    val sgn = when(u >= 0, 1.0).otherwise(-1.0)
    -lit(b) * sgn * log(greatest(lit(1.0) - lit(2.0) * abs(u),
      lit(1.0 / 4294967296.0)))
  }

  /** ε-DP count release per group: true count + Laplace(1/ε) noise
    * (sensitivity 1 for a count), rounded to the nearest integer and
    * clamped at 0 for publication. */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
               salt: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("true_n"))
      .withColumn("released_n",
        greatest(lit(0L),
          round(col("true_n") + laplaceNoise(col(groupCol), salt, 1.0 / epsilon), 0)
            .cast("long")))
}
