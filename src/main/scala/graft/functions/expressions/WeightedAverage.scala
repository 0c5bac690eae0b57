package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, Divide, EqualTo, Expression, If, IsNotNull, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native weighted average: Σ value·weight / Σ weight as a
  * DeclarativeAggregate — the fourth (and fastest) generation of the
  * engine's custom-aggregate ladder:
  *
  *   1. typed `Aggregator[(Double,Double),...]` ([[graft.functions.WeightedAvg]])
  *      — the Dataset surface; every input row round-trips through the
  *      tuple encoder;
  *   2. the same Aggregator via `functions.udaf` — DataFrame-callable,
  *      still encoder-bound (ScalaAggregator is a TypedImperativeAggregate
  *      whose buffer serializes per partial);
  *   3. a hand-rolled TypedImperativeAggregate would drop the input
  *      encoder but still evaluates interpreted with an opaque buffer;
  *   4. this: buffer = two DoubleType slots in the ordinary agg buffer
  *      row, update/merge/evaluate are plain Catalyst expressions —
  *      HashAggregateExec keeps the whole pipeline inside whole-stage
  *      codegen, identical in shape to the built-in `avg`.
  *
  * Same null semantics as the Aggregator path via udaf on nullable
  * input: rows where value or weight is NULL are skipped; an all-null /
  * empty group yields 0.0 (the Aggregator's zero-division guard), NOT
  * NULL — pinned against the udaf twin in ExpressionsSpec.
  */
case class WeightedAverage(value: Expression, weight: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def prettyName: String = "weighted_avg_native"
  override def left: Expression = value
  override def right: Expression = weight
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == DoubleType && weight.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double), got " +
      s"(${value.dataType.simpleString}, ${weight.dataType.simpleString})")

  private lazy val sumVW =
    AttributeReference("sumVW", DoubleType, nullable = false)()
  private lazy val sumW =
    AttributeReference("sumW", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumVW, sumW)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val bothSet = And(IsNotNull(value), IsNotNull(weight))
    Seq(
      If(bothSet, Add(sumVW, Multiply(value, weight)), sumVW),
      If(bothSet, Add(sumW, weight), sumW))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumVW.left, sumVW.right),
    Add(sumW.left, sumW.right))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(sumW, Literal(0.0)), Literal(0.0), Divide(sumVW, sumW))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedAverage =
    copy(value = newLeft, weight = newRight)
}

object WeightedAverage {
  /** Column-API entry; casts both inputs to double so integer measures
    * work like they do with the udaf twin. */
  def weightedAvgNative(value: Column, weight: Column): Column =
    ColumnBridge.column(
      WeightedAverage(
        ColumnBridge.expression(value.cast("double")),
        ColumnBridge.expression(weight.cast("double")))
        .toAggregateExpression())
}
