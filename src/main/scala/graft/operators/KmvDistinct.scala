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

  /** Pairwise KMV set-operation estimates between every pair of groups
    * (Beyer et al. 2007's k-minimum-values union/intersection): the
    * cross-source OVERLAP MATRIX without a pair join on the data.
    *
    * Per group, keep the k smallest distinct hashes (the KMV sketch —
    * sketches operate on the HASH set, so a 32-bit prefix collision
    * collapses identically in both engines). For a pair (A, B):
    * bottom-k of the sketch UNION estimates |A∪B| as (k−1)/h(k); the
    * fraction ρ of those k that appear in BOTH sketches estimates the
    * Jaccard, and ρ·|A∪B| the intersection. Every union-bottom-k hash
    * is ≤ each side's own k-th minimum, so sketch membership equals
    * set membership there — the estimator is exact arithmetic over
    * deterministic hashes, and pairs with < k union hashes are EXACT.
    *
    * Scale shape: one corpus pass builds the sketches (same
    * WindowGroupLimit pruning as [[estimate]]); everything after runs
    * on k rows per group — at 100 TB the G²/2 pair matrix costs
    * G²·k tiny rows, not a data join. Group count is the caller's
    * contract (sources, shards — bounded).
    *
    * Output: (src_a, src_b, n_union_kept, n_common, est_union,
    * est_jaccard, est_intersection), one row per unordered pair.
    */
  def overlapEstimate(df: DataFrame, groupCol: String, valueCol: Column,
                      k: Int, salt: String): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hs = df.select(col(groupCol).as("g"), valueCol.as("v"))
      .filter(col("v").isNotNull)
      .select(col("g"), Anonymize.md5Uniform(col("v"), salt).as("h"))
      .distinct()
    val w = Window.partitionBy("g").orderBy("h")
    // sketches are read three times below (groups, side A, side B) —
    // materialize once, like the sketch pipelines do
    val sk = hs.withColumn("r", row_number().over(w))
      .filter(col("r") <= k).select("g", "h")
      .localCheckpoint()
    val gs = sk.select("g").distinct()
    val pr = gs.select(col("g").as("ga"))
      .join(gs.select(col("g").as("gb")), col("ga") < col("gb"))
    val sideA = pr.join(sk, col("g") === col("ga"))
      .select(col("ga"), col("gb"), col("h"), lit(1).as("a"), lit(0).as("b"))
    val sideB = pr.join(sk, col("g") === col("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(0).as("a"), lit(1).as("b"))
    val ph = sideA.union(sideB)
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("a")).as("in_a"), max(col("b")).as("in_b"))
    val wp = Window.partitionBy("ga", "gb").orderBy("h")
    val agg = ph.withColumn("r", row_number().over(wp))
      .filter(col("r") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_kept"),
           max(when(col("r") === k, col("h"))).as("hk"),
           sum(when(col("in_a") === 1 && col("in_b") === 1, 1)
             .otherwise(0)).as("n_common"))
    val eu = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(lit((k - 1).toDouble) / col("hk"))
    val jac = col("n_common").cast("double") /
      when(col("n_kept") < k, col("n_kept")).otherwise(lit(k))
    agg.select(col("ga").as("src_a"), col("gb").as("src_b"),
        col("n_kept").as("n_union_kept"), col("n_common"),
        round(eu, 4).as("est_union"),
        round(jac, 6).as("est_jaccard"),
        round(jac * eu, 4).as("est_intersection"))
  }

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
