package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge

/** Native as-of join — the full custom-operator path (logical node →
  * planner strategy → physical operator), registered through
  * [[GraftExtensions]].
  *
  * Same semantics as [[graft.operators.AsOfJoin.backward]] (for each
  * left row, the LATEST right row with `right.time <= left.time` on the
  * same key; left-outer): rows sort once per side by (key, time), then
  * one forward merge scan per partition emits every match — no unioned
  * double-width rows, no window operator, no struct fill-forward. The
  * physical operator declares ClusteredDistribution on the keys and
  * (key, time) child orderings, so EnsureRequirements plans ONE
  * co-partitioning exchange + sort per side and AQE still handles skew;
  * at 100 TB this is the sort-merge-join shape with an O(1)-state
  * streaming probe instead of a buffered equi-match.
  */
object AsOfJoinPlan {

  /** Output contract shared by the logical and physical node: left
    * columns unchanged, right payload columns renamed `asof_*` and
    * forced nullable (no-match rows carry nulls). ExprIds are REUSED
    * from the right payload attributes so the physical output lines up
    * with what the analyzer resolved downstream. */
  private[plans] def outputFor(leftOutput: Seq[Attribute],
                               payload: Seq[Attribute]): Seq[Attribute] =
    leftOutput ++ payload.map(a =>
      a.withName(s"asof_${a.name}").withNullability(true))

  final case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute,
      rightPayload: Seq[Attribute], forward: Boolean) extends BinaryNode {
    override def output: Seq[Attribute] = outputFor(left.output, rightPayload)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, payload, fwd) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload, fwd) :: Nil
      case _ => Nil
    }
  }

  final case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute,
      rightPayload: Seq[Attribute], forward: Boolean) extends BinaryExecNode {

    override def output: Seq[Attribute] = outputFor(left.output, rightPayload)

    // One hash exchange per side on the join keys; EnsureRequirements
    // co-partitions the two children (same #partitions, same keys).
    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

    // In-partition sort by (key, time): the merge scan below is a
    // single forward pass over each side.
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

    override def outputOrdering: Seq[SortOrder] = left.outputOrdering
    override def outputPartitioning = left.outputPartitioning

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeyExprs: Seq[Expression] = leftKeys
      val rKeyExprs: Seq[Expression] = rightKeys
      val lTimeExpr: Expression = leftTime
      val rTimeExpr: Expression = rightTime
      val payloadExprs: Seq[Expression] = rightPayload
      val outAttrs = output
      val keyTypes = leftKeys.map(_.dataType)
      val timeType = leftTime.dataType
      val fwd = forward

      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        // (key ++ time) projected to one row per side: a single ordering
        // comparison decides both "right belongs to an earlier key" and
        // "right is at/before the left row's time" — nulls sort FIRST
        // (same as the window implementation's ascending sort).
        val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes :+ timeType)
        val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
        val lKtProj = UnsafeProjection.create(lKeyExprs :+ lTimeExpr, lOut)
        val rKtProj = UnsafeProjection.create(rKeyExprs :+ rTimeExpr, rOut)
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
        // Bind the payload side as NULLABLE: matched rows project real
        // values, unmatched rows read the all-null payload row — without
        // this the bound reference skips its null check and reads 0/"".
        val outProj = UnsafeProjection.create(outAttrs.map(a => a: Expression),
          lOut ++ rightPayload.map(_.withNullability(true)))
        val nullPayload: InternalRow = new GenericInternalRow(rightPayload.size)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          // BACKWARD: consume right rows at/before (lKey, lTime),
          // remembering the last same-key payload — the carried
          // candidate answers successive left rows.
          // FORWARD: discard right rows strictly before (lKey, lTime);
          // the first surviving right row is the match and is NOT
          // consumed (later left rows may share it).
          private var candPayload: InternalRow = _
          private var candKey: InternalRow = _
          private var rCur: InternalRow = _ // next unconsumed right row

          override def hasNext: Boolean = lIt.hasNext

          override def next(): InternalRow = {
            val lRow = lIt.next()
            val lKt = lKtProj(lRow)
            var advancing = true
            while (advancing) {
              if (rCur == null && rIt.hasNext) rCur = rIt.next()
              if (rCur == null) advancing = false
              else if (fwd) {
                if (ord.compare(rKtProj(rCur), lKt) < 0) rCur = null
                else advancing = false
              } else {
                if (ord.compare(rKtProj(rCur), lKt) <= 0) {
                  val rKey = rKeyProj(rCur)
                  if (keyOrd.compare(rKey, lKeyProj(lRow)) == 0) {
                    candPayload = payloadProj(rCur).copy()
                    candKey = rKey.copy()
                  }
                  rCur = null
                } else advancing = false
              }
            }
            val matched =
              if (fwd) rCur != null &&
                keyOrd.compare(rKeyProj(rCur), lKeyProj(lRow)) == 0
              else candKey != null &&
                keyOrd.compare(candKey, lKeyProj(lRow)) == 0
            val payload =
              if (!matched) nullPayload
              else if (fwd) payloadProj(rCur)
              else candPayload
            outProj(joined(lRow, payload))
          }
        }
      }
    }
  }

  /** Builder: resolve columns against the analyzed children and hand the
    * logical node to the planner. The right side is re-projected through
    * fresh aliases so self-joins (left and right scanning the same
    * table) can't carry conflicting attribute ids. */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame =
    join(left, right, keyCols, leftTime, rightTime, rightCols, forward = false)

  /** Forward variant: for each left row, the EARLIEST right row with
    * `right.time >= left.time` on the same key (kdb-style forward
    * as-of). Same merge scan, opposite consumption rule. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTime: String, rightTime: String,
              rightCols: Seq[String]): DataFrame =
    join(left, right, keyCols, leftTime, rightTime, rightCols, forward = true)

  private def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTime: String, rightTime: String,
                   rightCols: Seq[String], forward: Boolean): DataFrame = {
    val rFresh = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinNode(lPlan, rPlan,
      keyCols.map(attr(lPlan, _)), keyCols.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightCols.map(attr(rPlan, _)), forward)
    require(node.leftKeys.map(_.dataType) == node.rightKeys.map(_.dataType),
      "as-of join key types must match")
    require(node.leftTime.dataType == node.rightTime.dataType,
      "as-of join time types must match")
    // Self-register the strategy on sessions not built with
    // GraftExtensions (the supported dynamic-injection hook).
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    ColumnBridge.ofRows(spark, node)
  }
}
