package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Range}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: push `id` bound predicates into a `Range` scan.
  *
  * Catalyst pushes filters into file scans but NOT into `Range` — a
  * `spark.range(0, 10^16).where($"id".between(a, b))` plans as a full
  * 10^16-row scan plus filter. For this engine that matters: the
  * product-split source IS a range + decode projection, and a section /
  * point lookup on a product of 10^16 elements must prune to the
  * window (the reference does the same lookup in O(1),
  * /root/reference/docs/src/pmapreduce.md:133-138).
  *
  * The rule narrows `Range(start, end, step=1)` under a Filter using
  * every `id <op> literal` conjunct (>=, >, <=, <, =), keeping the
  * original Filter for any residual predicates. Installed by
  * [[GraftExtensions]] via `injectOptimizerRule`.
  */
object RangePruneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: Range)
        if r.step == 1 && r.output.length == 1 =>
      val id = r.output.head
      val conjuncts = splitConjuncts(cond)
      var lo = r.start
      var hi = r.end // exclusive
      conjuncts.foreach {
        case GreaterThanOrEqual(a: AttributeReference, IntegralLiteral(v)) if a.semanticEquals(id) =>
          lo = math.max(lo, v)
        case GreaterThan(a: AttributeReference, IntegralLiteral(v)) if a.semanticEquals(id) =>
          lo = math.max(lo, v + 1)
        case LessThanOrEqual(a: AttributeReference, IntegralLiteral(v)) if a.semanticEquals(id) =>
          hi = math.min(hi, v + 1)
        case LessThan(a: AttributeReference, IntegralLiteral(v)) if a.semanticEquals(id) =>
          hi = math.min(hi, v)
        case EqualTo(a: AttributeReference, IntegralLiteral(v)) if a.semanticEquals(id) =>
          lo = math.max(lo, v); hi = math.min(hi, v + 1)
        // mirrored literal-first forms
        case GreaterThanOrEqual(IntegralLiteral(v), a: AttributeReference) if a.semanticEquals(id) =>
          hi = math.min(hi, v + 1)
        case GreaterThan(IntegralLiteral(v), a: AttributeReference) if a.semanticEquals(id) =>
          hi = math.min(hi, v)
        case LessThanOrEqual(IntegralLiteral(v), a: AttributeReference) if a.semanticEquals(id) =>
          lo = math.max(lo, v)
        case LessThan(IntegralLiteral(v), a: AttributeReference) if a.semanticEquals(id) =>
          lo = math.max(lo, v + 1)
        case EqualTo(IntegralLiteral(v), a: AttributeReference) if a.semanticEquals(id) =>
          lo = math.max(lo, v); hi = math.min(hi, v + 1)
        case _ => ()
      }
      if (lo > r.start || hi < r.end) {
        val newLo = math.min(lo, hi)
        val newHi = hi
        val pruned = r.copy(start = newLo, end = math.max(newLo, newHi),
          numSlices = r.numSlices.map(n =>
            math.max(1L, math.min(n.toLong, math.max(1L, newHi - newLo))).toInt))
        // Keep the full original filter: correctness never depends on
        // the pruning, and residual conjuncts still apply.
        Filter(cond, pruned)
      } else f
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private object IntegralLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, _)    => Some(v)
      case Literal(v: Int, _)     => Some(v.toLong)
      case Literal(v: Short, _)   => Some(v.toLong)
      case Literal(v: Byte, _)    => Some(v.toLong)
      case Cast(Literal(v: Long, _), _, _, _) => Some(v)
      case Cast(Literal(v: Int, _), _, _, _)  => Some(v.toLong)
      case _ => None
    }
  }
}
