package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: key salting.
  *
  * A hash join on a skewed key sends every row of the hot key to one
  * task. Salting splits each skewed-side key into `saltFactor` synthetic
  * sub-keys and REPLICATES the build side once per sub-key, so the hot
  * key's probe rows spread across `saltFactor` tasks. Classic
  * time-for-space trade: build side grows ×saltFactor (keep it the small
  * side), probe side redistributes evenly.
  *
  * The salt on the probe side must be deterministic for reproducible
  * results — it hashes the probe row's OTHER columns, not rand().
  * (AQE's skew-join handles sort-merge spills adaptively at runtime;
  * explicit salting remains the tool when the skew is known and extreme,
  * or when the join must be a hash join.)
  */
object Salting {

  /** Inner equi-join of `probe` (large, skewed) with `build` (small)
    * on probe(probeKey) == build(buildKey), salted `saltFactor` ways.
    * `saltSource` columns drive the deterministic probe-side salt. */
  def saltedInnerJoin(probe: DataFrame, probeKey: String,
                      build: DataFrame, buildKey: String,
                      saltFactor: Int, saltSource: Seq[String]): DataFrame = {
    require(saltFactor > 0)
    val saltedProbe = probe.withColumn(
      "__salt", pmod(hash(saltSource.map(col): _*), lit(saltFactor)))
    val replicatedBuild = build.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedProbe
      .join(replicatedBuild,
        saltedProbe(probeKey) === replicatedBuild(buildKey) &&
        saltedProbe("__salt") === replicatedBuild("__salt"))
      .drop("__salt")
  }

  /** Two-phase salted aggregation: partial agg on (key, salt), final agg
    * on key. Spark's hash aggregate already does map-side partials, so
    * this only pays off for HIGH-CARDINALITY-VALUE aggs (collect_list,
    * distinct counts) where one reducer would hold the hot key's whole
    * value set; exposed for completeness of the skew toolkit. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltFactor: Int, saltSource: Seq[String]): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource.map(col): _*), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"))
}
