package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the deterministic,
  * oracle-replayable member of the cardinality family, next to the
  * built-in HLL++ audit (q39) the same way the bottom-k quantile sketch
  * (q351) sits next to GK.
  *
  * Estimator: hash every distinct value to a uniform in (0,1); if h(k)
  * is the k-th smallest hash in a group, the group's distinct count is
  * ≈ (k−1)/h(k) (the classic KMV/bottom-k estimator, Bar-Yossef et al.
  * 2002), with relative error ~1/√k. Groups with fewer than k distinct
  * values are EXACT (the sketch holds all of them).
  *
  * Everything is deterministic: the hash is the md5-uniform used by the
  * sampler family (same value → same hash, so duplicates vanish in the
  * distinct), merge is "k smallest of the union" — commutative and
  * associative — and DuckDB replays the estimate bit-for-bit.
  *
  * Scale shape: one shuffle for the (group, value) distinct (map-side
  * partial dedup), then the per-group k-smallest filter rides Spark's
  * WindowGroupLimit pushdown (rank ≤ k prunes per-partition BEFORE the
  * group exchange), so no group ever sorts more than its partition-
  * local survivors. 100 TB in, two bounded exchanges out.
  */
object KmvDistinct {

  /** Per-group KMV estimate: (groupCol, exact-ish columns left to the
    * caller) → (groupCol, n_kept, est_distinct). */
  def estimate(df: DataFrame, groupCol: String, valueCol: Column,
               k: Int, salt: String): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    // null values excluded: NULL is not a distinct value to a COUNT
    // (DISTINCT ...) oracle, and a null hash would sort FIRST in Spark
    // but LAST in DuckDB, shifting h(k) differently per engine.
    val d = df.select(col(groupCol), valueCol.as("v"))
      .filter(col("v").isNotNull).distinct()
      .withColumn("h", Anonymize.md5Uniform(col("v"), salt))
    val w = Window.partitionBy(groupCol).orderBy("h")
    d.withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"),
           max(when(col("r") === k, col("h"))).as("hk"))
      .select(col(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(k - 1).cast("double") / col("hk"))
          .as("est_distinct"))
  }
}
