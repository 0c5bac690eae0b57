package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-GROUP adaptive quantile gate — the mC4/CCNet per-language
  * threshold shape: instead of one global quality cutoff (which
  * over-filters low-resource languages whose whole distribution sits
  * below the English-tuned constant), each group drops its own bottom
  * `pct` percent by the signal. The threshold ADAPTS to the group's
  * distribution by construction.
  *
  * Exact rank semantics, no percentile interpolation: rows rank
  * ascending by (signal, id) inside their group, the group's drop
  * count is the INTEGER n·pct/100 (floor — a 9-row group at pct=10
  * drops 0, never a rounding-dependent 1), and a row survives iff
  * rank > dropCount. All comparisons are on a deterministic total
  * order, so any engine reproduces the exact survivor set — the same
  * cross-engine discipline as StratifiedSplit's quota arithmetic.
  *
  * Spark shape: one rank window + one count window per group partition
  * (they share the same partitioning, one shuffle total) — the
  * StratifiedSplit / domain-cap per-key window discipline; groups are
  * languages/sources (few, large), and at extreme per-group
  * cardinality the rank input can be pre-cut map-side by a
  * signal-histogram cushion before ranking.
  *
  * Reference scope: the reference has no quality gating at all;
  * extension surface next to QualityClassifier (SURVEY.md §2.9).
  */
object AdaptiveGate {

  /** Rows surviving the per-group bottom-`pct`% drop on `signal`
    * (ascending — low signal = low quality). Output: the input rows
    * (original columns) of survivors. */
  def dropBottom(df: DataFrame, groupCol: String, signalCol: String,
                 idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct < 100, s"pct must be in [0, 100): $pct")
    val w = Window.partitionBy(col(groupCol))
    val rk = row_number().over(w.orderBy(col(signalCol), col(idCol)))
    val n = count(lit(1)).over(w)
    // integral DIV: Column `/` is double division, whose float boundary
    // happens to floor correctly for `>` but breaks any `===` on it
    df.withColumn("__rk", rk)
      .withColumn("__n", n)
      .filter(col("__rk") > expr(s"__n * $pct DIV 100"))
      .drop("__rk", "__n")
  }

  /** The per-group CUT-KEY distillate for a streaming twin: each
    * group's FIRST KEPT row's (signal, id) pair. A row r of group g
    * drops iff (r.signal, r.id) <lex (cut_sig, cut_id) — on the same
    * data this reproduces [[dropBottom]]'s rank rule EXACTLY (the
    * first kept row is rank n·pct/100 + 1, and the (signal, id) order
    * is total), while staying CONTENT-BASED for never-seen rows: an
    * incoming document is priced against the corpus distribution's
    * cut without the corpus being rescanned. A group with a zero drop
    * count distills its minimum row (nothing on the corpus sits below
    * it, so replay is still exact; a never-seen row below it drops —
    * the corpus-state semantics every streaming gate here has).
    * Output: (groupCol, cut_sig, cut_id). */
  def cutKeys(df: DataFrame, groupCol: String, signalCol: String,
              idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct < 100, s"pct must be in [0, 100): $pct")
    val w = Window.partitionBy(col(groupCol))
    val rk = row_number().over(w.orderBy(col(signalCol), col(idCol)))
    val n = count(lit(1)).over(w)
    df.withColumn("__rk", rk)
      .withColumn("__n", n)
      .filter(col("__rk") === expr(s"__n * $pct DIV 100") + 1)
      .select(col(groupCol), col(signalCol).as("cut_sig"),
        col(idCol).as("cut_id"))
  }

  /** The gate's audit view: per group, how many rows dropped and the
    * exact boundary — the highest dropped signal and the lowest kept
    * signal (equal only when ties straddle the cut). */
  def report(df: DataFrame, groupCol: String, signalCol: String,
             idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct < 100, s"pct must be in [0, 100): $pct")
    val w = Window.partitionBy(col(groupCol))
    val rk = row_number().over(w.orderBy(col(signalCol), col(idCol)))
    df.withColumn("__rk", rk)
      .withColumn("__cut", expr(s"count(1) OVER (PARTITION BY $groupCol) * $pct DIV 100"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__rk") <= col("__cut"), 1L).otherwise(0L))
          .as("n_dropped"),
        max(when(col("__rk") <= col("__cut"), col(signalCol)))
          .as("max_dropped_signal"),
        min(when(col("__rk") > col("__cut"), col(signalCol)))
          .as("min_kept_signal"))
  }
}
