package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic curriculum ordering for training corpora (Bengio et
  * al. 2009's curriculum learning, as practiced for LM pretraining:
  * order examples by a difficulty proxy, but don't feed pure
  * easy→hard — interleave tiers so every training window sees the
  * full difficulty spectrum while the WITHIN-tier order still
  * progresses easy→hard).
  *
  * Mechanism (all integer arithmetic, so a SQL oracle reproduces it
  * exactly):
  *
  *   1. global difficulty index `idx` 0..n-1 by (score, id) — via
  *      [[RowIndexer.stableIndex]], i.e. one range shuffle + local
  *      sort + partition-offset stamp. NOT `row_number()` over a
  *      global window: that plans a single-partition sort, the
  *      classic 100 TB killer this repo pins against elsewhere
  *      (PlanShapeSpec).
  *   2. equi-depth tier: `tier = (idx * tiers) div n` — tier 0 is
  *      the easiest ⌈n/tiers⌉-ish slice, boundaries exact by integer
  *      division (no float quantiles, no approx).
  *   3. round-robin order key: within tier, position
  *      `pos = idx - ceil(tier·n / tiers)`; the emitted
  *      `ord = pos · tiers + tier` cycles tier 0,1,…,t-1, then the
  *      next element of each tier, … — a strict total order. When n
  *      is not divisible by tiers, `ord` has gaps (short final
  *      cycles) but ordering by it is still the exact round-robin
  *      schedule; consumers sort by `ord`, they don't index by it.
  *
  * Cost: one range shuffle, one count job (a scalar to the driver —
  * bounded by construction), map-side arithmetic. No collect of data,
  * no global window.
  *
  * Reference scope: the capstone never orders training data; this is
  * the training-data extension surface (difficulty-scheduled corpus
  * feeds).
  */
object Curriculum {

  /** Append (idx, tier, pos, ord) to `df` per the scheme above.
    * `scoreCol` is the difficulty proxy (ascending = easiest first);
    * (scoreCol, idCol) must be duplicate-free for full determinism —
    * idCol breaks score ties. */
  def interleave(df: DataFrame, idCol: String, scoreCol: String,
                 tiers: Int): DataFrame = {
    require(tiers >= 1, "need at least one tier")
    val indexed = RowIndexer.stableIndex(
      df, Seq(col(scoreCol), col(idCol)), "idx")
    // one scalar count — the only driver-side value the plan needs
    val n = indexed.count()
    indexed
      .withColumn("tier", expr(s"(idx * $tiers) div $n"))
      .withColumn("pos",
        col("idx") - expr(s"(tier * $n + ${tiers - 1}) div $tiers"))
      .withColumn("ord", col("pos") * tiers + col("tier"))
  }
}
