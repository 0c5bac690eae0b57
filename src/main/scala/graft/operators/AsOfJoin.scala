package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `right.time <= left.time` on the same key (DuckDB/kdb ASOF JOIN
  * semantics; Spark has no built-in).
  *
  * Implementation is the union + fill-forward window trick, NOT a range
  * join: both sides are tagged and unioned, then one
  * partitionBy(key).orderBy(time, side) sort makes `last_value(ignore
  * nulls)` carry each right row forward to the left rows it answers.
  * Cost: ONE shuffle + sort of |L|+|R| — no time-range cross product, no
  * per-row probing, skew-safe under AQE; this is the shape that survives
  * 100 TB where an interval join would explode.
  *
  * Right rows sort before left rows at equal timestamps, giving `<=`
  * (inclusive) match semantics; `rightCols` are the payload columns to
  * carry; rows from the left always survive (left-outer behavior). The
  * payload travels as a single struct so every `asof_*` column comes
  * from the SAME matched right row, even when some payload fields are
  * null.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "need at least one right payload column")
    val leftCols = left.columns.toSeq

    // The whole right payload rides in ONE struct column: the struct is
    // non-null for every right row (even when individual payload fields
    // are null), so a single last(ignoreNulls) carries the ENTIRE matched
    // row forward — per-column fills could mix fields from different
    // right rows whenever a payload value is null.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))

    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(keyCols.map(col) ++ Seq(col("__t"), col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)

    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(keyCols.map(col) ++ Seq(col("__t"), col("__side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rightCols.map(c => col("__r").getField(c).as(s"asof_$c")): _*)
  }
}
