package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the shuffle reducer for selective joins
  * at scale: when the build side is too big to broadcast as a hash
  * table but its KEY SET fits a few-MB sketch, shipping a Bloom filter
  * to the probe side drops non-matching rows BEFORE the shuffle, so the
  * exchange moves only rows that can actually join (plus the fpp).
  *
  * This is the manual, deterministic form of Spark's own runtime
  * row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`,
  * which injects the same shape opportunistically): build via
  * `DataFrameStatFunctions.bloomFilter` (one pass, mergeable partial
  * sketches), broadcast the bits, probe with a cheap membership test.
  * False positives only ever ADD rows to the shuffle, never change the
  * join result — the join condition still decides matches, so the
  * operator is exactly result-equivalent to the plain join
  * (ScaleOpsSpec asserts both equivalence and pruning).
  */
object BloomJoin {

  /** Inner equi-join of `probe ⋈ build` with the probe side pre-pruned
    * by a Bloom filter over `build`'s join keys (long-typed keys — the
    * common surrogate-key case). */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
                      probeKey: String, buildKey: String,
                      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf: BloomFilter = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val pruned = prune(probe, probeKey, bf)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }

  /** The probe-side filter alone (composable into larger pipelines).
    * The sketch travels once per executor as a broadcast variable; the
    * membership test is a per-row hash, no shuffle, narrow.
    *
    * Broadcast lifetime is caller-managed: each call registers a new
    * broadcast that lives until the returned DataFrame becomes
    * unreachable and the ContextCleaner reclaims it. Long-running
    * drivers looping over many multi-MB sketches should hold the
    * filter, reuse `prune`, and let each result go out of scope
    * promptly (or build fewer, coarser filters). */
  def prune(probe: DataFrame, keyCol: String, bf: BloomFilter): DataFrame = {
    val bcast = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    probe.filter(mightContain(col(keyCol)))
  }
}
