package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge — apply a change stream (insert / update / delete ops) to
  * a keyed snapshot: the MERGE INTO / apply-changes primitive every
  * incremental pipeline needs between "yesterday's curated corpus" and
  * "today's crawl delta".
  *
  * Semantics (per key):
  *   - latest change by `seqCol` wins when a key has several changes
  *     (out-of-order CDC feeds are the norm);
  *   - 'D' drops the key, 'I'/'U' upsert the change row's payload;
  *   - untouched base rows pass through.
  *
  * Shape: one argmax-dedup of the (small) change set, then ONE full
  * shuffle join of base against deduped changes on the key — no
  * per-row lookups, no driver loops; at 100 TB the base side arrives
  * hash-partitioned by key and AQE handles change-set skew. With a
  * bucketed/range-clustered base table the join co-locates and the
  * only movement is the delta.
  */
object CdcMerge {

  /** @param base     keyed snapshot; all payload columns kept
    * @param changes  same schema as base plus `opCol` ('I'|'U'|'D') and
    *                 `seqCol` (monotone change order within a key)
    * @return the merged snapshot with base's schema */
  def apply(base: DataFrame, changes: DataFrame, keyCol: String,
            opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    // Latest change per key wins (deterministic: seq is the order).
    // Change payloads are renamed __chg_* so the merge resolves by
    // name even when base and changes share lineage (self-join safe).
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol) +: col(opCol) +:
        payload.map(c => col(c).as(s"__chg_$c")): _*)

    base.join(latest, Seq(keyCol), "full_outer")
      .filter(
        // deleted keys drop; change-only keys must be inserts/updates;
        // base-only keys pass through
        coalesce(col(opCol) =!= "D", lit(true)))
      .select(col(keyCol) +: payload.map(c =>
        when(col(opCol).isNotNull, col(s"__chg_$c")).otherwise(col(c)).as(c)): _*)
  }
}
