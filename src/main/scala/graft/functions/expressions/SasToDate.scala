package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DateType, IntegerType}

/** Native Catalyst expression: SAS day-offset (days since 1960-01-01) →
  * DateType, fully codegen'd.
  *
  * The composed-built-ins form (graft.functions.SasDate) is the default;
  * this expression is the exact-codegen-control variant the survey flags
  * as the custom-Catalyst candidate (SURVEY.md §4): Spark's internal
  * date representation is days since 1970-01-01, so the conversion
  * collapses to ONE integer subtraction in generated code — no Python
  * UDF (the reference's etl.py:255 shape), no date_add call tree.
  *
  * Input contract: IntegerType (the builders below insert the cast;
  * fractional SAS days truncate, matching the reference's int() use).
  * 3653 = days from 1960-01-01 to 1970-01-01 (leap 1960/64/68).
  */
case class SasToDate(child: Expression) extends UnaryExpression {

  private val EpochShift = 3653

  override def dataType: DataType = DateType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sas_to_date"

  override protected def nullSafeEval(days: Any): Any =
    days.asInstanceOf[Int] - EpochShift

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"$d - $EpochShift")

  override protected def withNewChildInternal(newChild: Expression): SasToDate =
    copy(child = newChild)
}

object SasToDate {
  /** Registry builder: casts whatever numeric arrives to int. */
  def fromAny(e: Expression): SasToDate = SasToDate(Cast(e, IntegerType))

  /** Column surface. */
  def sasToDate(c: Column): Column =
    ColumnBridge.column(SasToDate(ColumnBridge.expression(c.cast("int"))))
}
