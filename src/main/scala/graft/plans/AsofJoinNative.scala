package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.DatasetBridge

/** Native as-of join: a full custom operator — LogicalPlan node +
  * planner Strategy + physical SparkPlan — registered through
  * `SparkSessionExtensions` (GraftExtensions). This is tier (c) of the
  * custom-operator preference order (SURVEY §7.3): whole-operator
  * semantics Spark's builtins can't express as ONE operator.
  *
  * Semantics (backward, inclusive — reference semantics mirrored from
  * [[graft.operators.AsofJoin]]): for every left row, attach the
  * payload of the right row with the greatest (rightTs, payload)
  * having rightTs <= leftTs and equal key; null payload when none.
  * Ties on rightTs resolve to the maximum payload tuple — identical
  * to the union+window composition's `last(_rrow)` choice, so the two
  * implementations are result-interchangeable.
  *
  * Physical shape — why a custom exec beats the composition at scale:
  * the composition UNIONs both sides through one shuffle + one running
  * window (all rows buffered through WindowExec); this exec shuffles
  * each side by its own key, sorts each side once (Exchange + Sort per
  * child, exactly like a sort-merge join), then streams BOTH sorted
  * iterators through a single forward-only merge pass per partition —
  * no window buffer, no unioned wide-null schema, one right-row copy
  * as the only per-row allocation. Output preserves the left side's
  * (key, ts) order and partitioning, so downstream per-key operators
  * reuse the exchange. */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsofJoinNode → AsofJoinExec. Injected via
  * `GraftExtensions.injectPlannerStrategy`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.rightKey, n.leftTs, n.rightTs, n.payload, n.output) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute],
                        output: Seq[Attribute]) extends BinaryExecNode {

  // Same co-partitioning contract as SortMergeJoin: both children
  // clustered on their key; EnsureRequirements/AQE plan compatible
  // exchanges (and coalesce them identically — they feed one stage).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // Right side additionally sorted by payload so the "last match at
  // equal ts" is the MAX payload tuple — the composition's tie-break.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = rOut.indexWhere(_.exprId == rightTs.exprId)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val payloadAttrs = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val ordK = TypeUtils.getInterpretedOrdering(keyType)
      val ordT = TypeUtils.getInterpretedOrdering(tsType)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      // input schema carries the NULLABLE payload attrs: bindReference
      // takes nullability from the input sequence, and the no-match
      // rows are null exactly where the source attrs said they can't be
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ payloadAttrs.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      // Forward-only merge state: the parked right head (copied — sort
      // iterators reuse row buffers) and the best match so far. The
      // match stays valid while the left key equals matchKey; left
      // keys only ascend, so dead right rows are never revisited.
      var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var matchRow: InternalRow = null
      var matchKey: Any = null
      def advance(): Unit =
        rRow = if (rIter.hasNext) rIter.next().copy() else null
      lIter.map { lRow =>
        val k = if (lRow.isNullAt(lKeyIdx)) null else lRow.get(lKeyIdx, keyType)
        val t = if (lRow.isNullAt(lTsIdx)) null else lRow.get(lTsIdx, tsType)
        var emitMatch = false
        if (k != null && t != null) {
          var scanning = true
          while (scanning && rRow != null) {
            val rk = if (rRow.isNullAt(rKeyIdx)) null else rRow.get(rKeyIdx, keyType)
            if (rk == null) advance() // null keys never match; sorted first
            else {
              val c = ordK.compare(rk, k)
              if (c < 0) advance() // dead key: left keys only ascend
              else if (c == 0) {
                val rt = if (rRow.isNullAt(rTsIdx)) null else rRow.get(rTsIdx, tsType)
                if (rt == null) advance() // null ts never matches; sorted first
                else if (ordT.compare(rt, t) <= 0) {
                  matchRow = rRow; matchKey = rk // rk points into the copy we keep
                  advance()
                } else scanning = false
              } else scanning = false
            }
          }
          emitMatch = matchRow != null && matchKey != null && ordK.compare(matchKey, k) == 0
        }
        joined(lRow, if (emitMatch) payloadProj(matchRow) else nullPayload)
        resultProj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinNative {
  /** Backward (inclusive) as-of join through the native operator.
    * Requires a session with GraftExtensions (e.g. GraftSession.build)
    * — the strategy is injected, not built in. The right side is
    * re-aliased to fresh exprIds so self-joins (both sides derived
    * from one source) never carry conflicting attributes into the
    * binary node. */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    DatasetBridge.ensureStrategy(spark, AsofJoinStrategy)
    val r = right.toDF(right.columns.toIndexedSeq: _*) // fresh exprIds
    val lPlan = DatasetBridge.analyzed(left)
    val rPlan = DatasetBridge.analyzed(r)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    DatasetBridge.ofRows(spark, AsofJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightPayload.map(attr(rPlan, _))))
  }
}
