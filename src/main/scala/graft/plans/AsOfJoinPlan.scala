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

      // One-row lookahead over the sorted right side with its key/time
      // evaluated ONCE per right row (the first cut re-evaluated them
      // per left-row comparison — the dominant measured cost). Rows are
      // copied BEFORE eval because sort output buffers are reused and a
      // UTF8String key would otherwise point into recycled memory.
      // Null-keyed/timed right rows are skipped outright: they can
      // never be an as-of match, and the interpreted orderings are not
      // null-safe.
      var rHead: InternalRow = null
      var rHeadKey: AnyRef = null; var rHeadTime: AnyRef = null
      def advance(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next().copy()
          val k = rKeyB.eval(r); val t = rTimeB.eval(r)
          if (k != null && t != null) {
            rHead = r
            rHeadKey = k.asInstanceOf[AnyRef]; rHeadTime = t.asInstanceOf[AnyRef]
          }
        }
      }
      advance()
      // last consumed right row, its cached key, and its lazily
      // projected payload. The projection is safe uncopied: payloadProj
      // is called nowhere else, so the buffer stays valid exactly until
      // the cache is replaced.
      var lastRight: InternalRow = null
      var lastKey: AnyRef = null
      var lastPayload: InternalRow = null

      lIter.map { l =>
        val lkAny = lKeyB.eval(l); val ltAny = lTimeB.eval(l)
        if (lkAny == null || ltAny == null) {
          // a null key/time never matches (same as the composed form
          // and DuckDB ASOF: comparison with null is no-match)
          toUnsafe(joined(l, nullRow))
        } else {
          val lk = lkAny.asInstanceOf[AnyRef]; val lt = ltAny.asInstanceOf[AnyRef]
          while (rHead != null && {
            val c = keyOrd.compare(rHeadKey, lk)
            c < 0 || (c == 0 && timeOrd.compare(rHeadTime, lt) <= 0)
          }) {
            lastRight = rHead; lastKey = rHeadKey; lastPayload = null
            advance()
          }
          if (lastRight != null && keyOrd.compare(lastKey, lk) == 0) {
            if (lastPayload == null) lastPayload = payloadProj(lastRight)
            toUnsafe(joined(l, lastPayload))
          } else toUnsafe(joined(l, nullRow))
        }
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
    val rp0 = right.queryExecution.analyzed
    // Self-join shape: when both sides derive from the same base scan
    // they SHARE attribute exprIds, and Catalyst (which de-duplicates
    // only its own Join nodes, never a custom binary node) would treat
    // the right child's copy as "already provided by left" and prune
    // it away — binding then fails with ATTRIBUTE_NOT_FOUND (hit by
    // q187, where dim and fact are both views over events). Fresh
    // Aliases mint new exprIds for the right side, which is exactly
    // what Spark's own dedupRight does for SQL self-joins.
    val rp: LogicalPlan =
      if (rp0.outputSet.intersect(lp.outputSet).isEmpty) rp0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
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
