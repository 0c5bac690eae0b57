package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since
  * the previous event of the same key exceeds `gapSeconds`.
  *
  * Classic lag + running-sum window pair — one shuffle on the key, both
  * windows share the same sort. Timestamps compare in epoch
  * MICROseconds (the engine's native resolution after the
  * Tables.normalizeTs conversion) so the DuckDB twin mirrors exactly. */
object Sessionize {

  /** Adds `session_id` (1-based per key, in time order). Ordering ties
    * break on `tieCol` for determinism. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    val w   = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val gap = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w))
    df.withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Same semantics through the native
    * [[graft.functions.expressions.SessionId]] window function: ONE
    * Window operator instead of the lag + running-sum pair (same
    * shuffle, half the window passes, no intermediate column).
    * Bit-identical ids — NativeSessionizeSpec and q394's shared
    * oracle pin the equivalence. */
  def sessionizeNative(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder, UnspecifiedFrame, WindowExpression, WindowSpecDefinition}
    import org.apache.spark.sql.graft.ColumnBridge
    // Spark 4's Column.over does not wrap a raw custom WindowFunction,
    // so the WindowExpression is built directly in Catalyst; the
    // UnspecifiedFrame resolves to the function's own running frame.
    val spec = WindowSpecDefinition(
      Seq(ColumnBridge.expression(col(keyCol))),
      Seq(SortOrder(ColumnBridge.expression(col(tsCol)), Ascending),
          SortOrder(ColumnBridge.expression(col(tieCol)), Ascending)),
      UnspecifiedFrame)
    df.withColumn("session_id", ColumnBridge.column(WindowExpression(
      graft.functions.expressions.SessionId(
        ColumnBridge.expression(col(tsCol)), gapSeconds * 1000000L),
      spec)))
  }
}
