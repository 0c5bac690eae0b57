package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch: bottom-k hash sampling.
  *
  * Spark's built-in `approx_percentile` (Greenwald–Khanna) is the usual
  * distributed quantile sketch, but its merge is ORDER-DEPENDENT — the
  * result can change with shuffle-fetch order, so no value-exact oracle
  * (DuckDB or golden parquet) can pin it. This operator provides the
  * deterministic alternative: keep the k rows whose md5 over a unique
  * key is smallest. Bottom-k by hash is a true mergeable sketch — the
  * per-partition partial is "my k smallest hashes", the combine is
  * "k smallest of the union", which is commutative, associative, and
  * insensitive to partitioning or arrival order — and, unlike GK, every
  * engine that has md5 can replay it bit-for-bit, which is what makes
  * the q351 audit fully DuckDB-oracled.
  *
  * Spark plans `orderBy(hash).limit(k)` as TakeOrderedAndProject:
  * map-side per-partition top-k heaps, then a k-row driver merge — at
  * 100 TB each of 10⁶ tasks ships k rows, nothing ever sorts globally.
  * The nearest-rank estimate from a uniform k-sample has rank error
  * O(√(q(1−q)/k)) w.h.p. (Dvoretzky–Kiefer–Wolfowitz); k=1024 puts the
  * 3σ band at ~±0.047 for the median.
  *
  * Reference scope: the reference repo computes no quantiles at all;
  * this sits in the sketch ladder next to Count-Min (q325/q329) and
  * HLL (approx_count_distinct family) as the LLM-pipeline extension.
  */
object HashSampleQuantiles {

  /** The k rows with smallest (md5(sampleKey), value) — a deterministic
    * uniform sample (md5 is a fixed pseudo-random permutation of the
    * key space; no seed, no RNG, no order sensitivity). The value
    * tiebreak makes the cut a total order even when sampleKey is NOT
    * unique (the synthetic lineitem has ~12k duplicate
    * (orderkey, linenumber) pairs): rows tied on both hash and value
    * are interchangeable, so the selected multiset is well-defined. */
  def bottomKSample(df: DataFrame, valueCol: Column, sampleKey: Column,
                    k: Int): DataFrame =
    df.select(valueCol.as("v"), md5(sampleKey).as("h"))
      // null values/keys are excluded: a quantile over nulls is
      // undefined, and Spark sorts nulls FIRST where DuckDB sorts them
      // LAST — admitting them would silently skew the cut differently
      // per engine.
      .filter(col("v").isNotNull && col("h").isNotNull)
      .orderBy("h", "v")
      .limit(k)
      .select("v")

  /** Nearest-rank quantile estimates from a bottom-k sample: the
    * element at row_number ceil(q·k_eff) of the sorted sample, where
    * k_eff = min(k, actual sample size) so a corpus smaller than k
    * still gets properly-scaled ranks (for n ≥ k this is exactly
    * ceil(q·k), which is what the q351 oracle bakes in as literals).
    * The single k-row window is bounded by construction (k ≪ executor
    * memory). */
  def sampleQuantiles(sample: DataFrame, k: Int, qs: Seq[Double]): DataFrame = {
    val all = Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)
    val ranked = sample
      .withColumn("r", row_number().over(Window.orderBy("v")))
      .withColumn("n", count(lit(1)).over(all))
    val tdf = sample.sparkSession
      .createDataFrame(qs.map(Tuple1.apply)).toDF("q")
    ranked.join(broadcast(tdf),
        col("r") === greatest(lit(1),
          ceil(col("q") * least(lit(k), col("n"))).cast("int")))
      .select(col("q"), col("v").as("est_p"))
  }
}
