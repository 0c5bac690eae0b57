package graft.functions

import org.apache.spark.sql.SparkSession

import graft.functions.expressions.{DotProduct, SasToDate}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT sas_to_date(arrdate) ...")` works alongside the
  * Column API (the reference exposes both surfaces, SURVEY.md §3.3). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "sas_to_date", exprs => SasToDate.fromAny(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct.fromAny(exprs.head, exprs(1)), "scala_udf")
  }
}
