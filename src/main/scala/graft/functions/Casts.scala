package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** Bulk column casting (reference `qhi.cast_totype`, qhi.py:3-17).
  *
  * The reference loops `withColumn(c, col(c).cast(t))` per column; the
  * fold below is the same shape but builds ONE projection — Catalyst
  * collapses the chain either way, this just keeps the logical plan flat
  * for wide column lists.
  */
object Casts {
  def castTo(df: DataFrame, cols: Seq[String], to: DataType): DataFrame = {
    val set = cols.toSet
    df.select(df.columns.toSeq.map { c =>
      if (set.contains(c)) col(c).cast(to).as(c) else col(c)
    }: _*)
  }
}
