package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
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
  * Semantics (mirroring [[graft.operators.AsofJoin]], both modes):
  * backward attaches, per left row, the payload of the right row with
  * the greatest (rightTs, payload) having rightTs <= leftTs and equal
  * keys; forward the one with the smallest ts >= leftTs (tie-break at
  * equal ts: max payload tuple — identical to the composition's
  * `last(_rrow)` choice, so the implementations are
  * result-interchangeable). Null payload when no match; null keys and
  * null timestamps never match (SQL comparison semantics).
  *
  * Physical shape — why a custom exec beats the composition at scale:
  * the composition UNIONs both sides through one shuffle + one running
  * window (all rows buffered through WindowExec); this exec shuffles
  * each side by its own keys, sorts each side once (Exchange + Sort
  * per child, exactly like a sort-merge join), then streams BOTH
  * sorted iterators through a single forward-only merge pass per
  * partition — no window buffer, no unioned wide-null schema, one
  * right-row copy as the only per-row allocation. Output preserves the
  * left side's (keys, ts) order and partitioning, so downstream
  * per-key operators reuse the exchange. */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTs: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute],
                        forward: Boolean) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length)
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
        n.leftKeys, n.rightKeys, n.leftTs, n.rightTs, n.payload, n.forward,
        n.output) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTs: Attribute, rightTs: Attribute,
                        payload: Seq[Attribute], forward: Boolean,
                        output: Seq[Attribute]) extends BinaryExecNode {

  private def tsDir = if (forward) Descending else Ascending

  // Same co-partitioning contract as SortMergeJoin: both children
  // clustered on their keys; EnsureRequirements/AQE plan compatible
  // exchanges (and coalesce them identically — they feed one stage).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // ts runs WITH the merge direction (desc for forward), so "already
  // passed the bound" right rows are the ones still ahead; the right
  // side additionally sorts by payload so the last match at equal ts
  // is the MAX payload tuple — the composition's tie-break.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, tsDir),
    (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, tsDir)) ++
      payload.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = leftKeys.map(k => lOut.indexWhere(_.exprId == k.exprId)).toArray
    val rKeyIdx = rightKeys.map(k => rOut.indexWhere(_.exprId == k.exprId)).toArray
    val lTsIdx = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rTsIdx = rOut.indexWhere(_.exprId == rightTs.exprId)
    val keyTypes = leftKeys.map(_.dataType).toArray
    val tsType = leftTs.dataType
    val nKeys = keyTypes.length
    val payloadAttrs = payload
    val outAttrs = output
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val ordKs = keyTypes.map(TypeUtils.getInterpretedOrdering)
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
      // match stays valid while the left keys equal matchKeys; left
      // keys only ascend, so dead right rows are never revisited.
      var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var matchRow: InternalRow = null
      var matchKeys: Array[Any] = null
      def advance(): Unit =
        rRow = if (rIter.hasNext) rIter.next().copy() else null
      // key tuple of a row; null if ANY component is null (unmatchable)
      def keysOf(row: InternalRow, idx: Array[Int]): Array[Any] = {
        val out = new Array[Any](nKeys)
        var i = 0
        while (i < nKeys) {
          if (row.isNullAt(idx(i))) return null
          out(i) = row.get(idx(i), keyTypes(i))
          i += 1
        }
        out
      }
      def compareKeys(a: Array[Any], b: Array[Any]): Int = {
        var i = 0
        while (i < nKeys) {
          val c = ordKs(i).compare(a(i), b(i))
          if (c != 0) return c
          i += 1
        }
        0
      }
      // rt is inside the bound: <= t backward, >= t forward
      def inBound(rt: Any, t: Any): Boolean = {
        val c = ordT.compare(rt, t)
        if (fwd) c >= 0 else c <= 0
      }
      lIter.map { lRow =>
        val lk = keysOf(lRow, lKeyIdx)
        val t = if (lRow.isNullAt(lTsIdx)) null else lRow.get(lTsIdx, tsType)
        var emitMatch = false
        if (lk != null && t != null) {
          var scanning = true
          while (scanning && rRow != null) {
            val rk = keysOf(rRow, rKeyIdx)
            if (rk == null) advance() // null keys never match; sorted first
            else {
              val c = compareKeys(rk, lk)
              if (c < 0) advance() // dead key: left keys only ascend
              else if (c == 0) {
                val rt = if (rRow.isNullAt(rTsIdx)) null else rRow.get(rTsIdx, tsType)
                // null ts never matches — skip it wherever the null
                // ordering put it (first for asc, last for desc)
                if (rt == null) advance()
                else if (inBound(rt, t)) {
                  matchRow = rRow; matchKeys = rk // rk points into the kept copy
                  advance()
                } else scanning = false
              } else scanning = false
            }
          }
          emitMatch = matchRow != null && matchKeys != null &&
            compareKeys(matchKeys, lk) == 0
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
  /** Backward (inclusive) as-of join through the native operator. */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame =
    join(left, right, Seq(key), leftTs, rightTs, rightPayload, forward = false)

  /** Forward (inclusive) as-of join: earliest right at-or-after. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightPayload: Seq[String]): DataFrame =
    join(left, right, Seq(key), leftTs, rightTs, rightPayload, forward = true)

  /** Multi-key backward as-of. */
  def backwardKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String]): DataFrame =
    join(left, right, keys, leftTs, rightTs, rightPayload, forward = false)

  /** Requires a session with GraftExtensions (e.g. GraftSession.build)
    * or falls back to appending the strategy at runtime. The right
    * side is re-aliased to fresh exprIds so self-joins (both sides
    * derived from one source) never carry conflicting attributes into
    * the binary node. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightPayload: Seq[String],
           forward: Boolean): DataFrame = {
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
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightPayload.map(attr(rPlan, _)), forward))
  }
}
