package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences,
  Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The custom-operator tier (c) from the build contract: a whole-plan
  * AS-OF join as LogicalPlan + Strategy + SparkPlan, registered through
  * SparkSessionExtensions. Semantics identical to the composed
  * `Relational.asOfJoin` (pinned by AsOfNativeSpec and the q48 oracle):
  * for each left row, the right payload of the largest rightTime ≤
  * leftTime within the key, null when none.
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * by (key, time) — declared via requiredChildDistribution/Ordering so
  * EnsureRequirements inserts exactly the exchanges a sort-merge join
  * would get — then a single streaming merge pass per partition: O(L+R)
  * with O(1) state (the last matching right row). Compared to the
  * composed union+window form this avoids materializing the unioned
  * sort and the null-carry columns.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override def outputPartitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lOut = left.output; val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTimeB = BindReferences.bindReference(leftTime: Expression, lOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTimeB = BindReferences.bindReference(rightTime: Expression, rOut)
    val payloadB = payload.map(p => BindReferences.bindReference(p: Expression, rOut))
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadB)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRow = InternalRow.fromSeq(Seq.fill(payload.size)(null))
      val joined = new JoinedRow

      // one-row lookahead over the sorted right side; rows are copied
      // because sort output buffers are reused
      var rHead: InternalRow = null
      def advance(): Unit = rHead = if (rIter.hasNext) rIter.next().copy() else null
      advance()
      // last right row with (key, time) ≤ the current left cursor
      var lastRight: InternalRow = null

      lIter.map { l =>
        val lk = lKeyB.eval(l); val lt = lTimeB.eval(l)
        while (rHead != null && {
          val c = keyOrd.compare(rKeyB.eval(rHead).asInstanceOf[AnyRef],
            lk.asInstanceOf[AnyRef])
          c < 0 || (c == 0 &&
            timeOrd.compare(rTimeB.eval(rHead).asInstanceOf[AnyRef],
              lt.asInstanceOf[AnyRef]) <= 0)
        }) { lastRight = rHead; advance() }
        val matched = lastRight != null && lk != null &&
          keyOrd.compare(rKeyB.eval(lastRight).asInstanceOf[AnyRef],
            lk.asInstanceOf[AnyRef]) == 0
        toUnsafe(joined(l, if (matched) payloadProj(lastRight) else nullRow))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Builder over resolved child plans (no analyzer rule needed — the
  * node is constructed already-resolved from the Dataset API). */
object AsOfJoinNative {
  def apply(left: DataFrame, leftTime: String,
            right: DataFrame, rightTime: String,
            key: String, rightPayload: Seq[String]): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    ColumnBridge.ofRows(left.sparkSession,
      AsOfJoinNode(lp, rp,
        attr(lp, key), attr(lp, leftTime),
        attr(rp, key), attr(rp, rightTime),
        rightPayload.map(attr(rp, _))))
  }
}
