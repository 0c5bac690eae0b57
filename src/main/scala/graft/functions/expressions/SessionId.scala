package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{AggregateWindowFunction, Add, AttributeReference, Expression, GreaterThan, If, IsNull, Literal, Or, Subtract, UnixMicros}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst WINDOW FUNCTION: gap-based session ids in ONE
  * running-frame pass — graft's AggregateWindowFunction extension
  * point, the last Catalyst surface next to its scalar Expressions,
  * Generator (ChunkSplit), and DeclarativeAggregate (WeightedAverage).
  *
  * The composable form ([[graft.operators.Sessionize]]) is the classic
  * lag + running-sum PAIR: two Window operators over the same sort
  * (Spark does not fuse them), materializing the lag column between
  * passes. This function keeps (last_ts, session_id) as a two-slot
  * aggregate buffer updated per row inside a single Window operator —
  * same shuffle, half the window passes, no intermediate column. A new
  * session starts when the previous timestamp is absent or more than
  * `gapMicros` behind; ids are 1-based per partition in frame order,
  * bit-identical to the composed form (NativeSessionizeSpec + q394's
  * shared oracle pin it).
  */
case class SessionId(ts: Expression, gapMicros: Long)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(ts)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "session_id"

  private lazy val sid =
    AttributeReference("sid", LongType, nullable = false)()
  private lazy val lastTs =
    AttributeReference("lastTs", LongType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(sid, lastTs)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal.create(null, LongType))

  private def micros: Expression = UnixMicros(ts)

  override val updateExpressions: Seq[Expression] = Seq(
    If(Or(IsNull(lastTs),
          GreaterThan(Subtract(micros, lastTs), Literal(gapMicros))),
       Add(sid, Literal(1L)), sid),
    micros)

  override val evaluateExpression: Expression = sid

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SessionId =
    copy(ts = newChildren.head)
}

object SessionId {
  /** Column surface: `sessionId($"ts", 1800).over(w)`. */
  def sessionId(ts: Column, gapSeconds: Long): Column =
    ColumnBridge.column(SessionId(
      ColumnBridge.expression(ts), gapSeconds * 1000000L))
}
