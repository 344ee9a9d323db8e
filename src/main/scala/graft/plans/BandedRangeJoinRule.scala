package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a naive epsilon join into a banded equi-join.
  *
  * An inner join whose only usable predicate is `abs(ta - tb) <= W`
  * (no equi key) is planned by Spark as a BroadcastNestedLoopJoin or a
  * cartesian product — O(|L|·|R|) comparisons, unrunnable at scale.
  * But the predicate itself is bandable: quantize both time axes into
  * W-wide buckets and any qualifying pair's buckets differ by at most
  * one (every bucket's preimage has width >= W, and the bucket mapping
  * is monotonic — `div` truncation around zero only widens bucket 0,
  * which keeps the bound). So:
  *
  *   L JOIN R ON |ta - tb| <= W
  *     ==  (L exploded into buckets {b-1, b, b+1})
  *         JOIN R ON L.bucket = R.bucket AND |ta - tb| <= W
  *
  * Each qualifying pair matches on EXACTLY one of the three exploded
  * copies (R's bucket is a single value), so no dedup step is needed —
  * the rewrite is result-identical, and the equi conjunct turns the
  * plan into a shuffled hash/sort-merge join with 3|L| rows on one
  * side. Users (and ported SQL) get the O(n) plan for free instead of
  * needing to hand-write `graft.sync.RangeJoin`.
  *
  * Guardrails: fires only on Inner joins, only when NO equi-join
  * conjunct exists (if one does, Spark already hash-joins and the band
  * would be pure overhead — and this also makes the rule a no-op on
  * its own output), and only for integral (micros-style) axes where
  * the band arithmetic is exact.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def bandWidth(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) if v > 0    => Some(v)
    case Literal(v: Integer, IntegerType) if v > 0 => Some(v.toLong)
    case _ => None
  }

  /** `|x - y| <= w` / `|x - y| < w` (either comparison orientation). */
  private def matchEpsilon(c: Expression): Option[(Expression, Expression, Long)] =
    c match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), w) =>
        bandWidth(w).map((x, y, _))
      case LessThan(Abs(Subtract(x, y, _), _), w) =>
        bandWidth(w).map((x, y, _))
      case GreaterThanOrEqual(w, Abs(Subtract(x, y, _), _)) =>
        bandWidth(w).map((x, y, _))
      case GreaterThan(w, Abs(Subtract(x, y, _), _)) =>
        bandWidth(w).map((x, y, _))
      case _ => None
    }

  private def hasEquiKey(conjuncts: Seq[Expression],
                         left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) &&
          r.references.subsetOf(right.outputSet)) ||
          (l.references.subsetOf(right.outputSet) &&
            r.references.subsetOf(left.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val eligible =
        if (hasEquiKey(conjuncts, left, right)) None
        else conjuncts.iterator.flatMap { c =>
          matchEpsilon(c).flatMap { case (x, y, w) =>
            if (x.dataType != LongType || y.dataType != LongType) None
            else if (x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet)) Some((x, y, w))
            else if (y.references.subsetOf(left.outputSet) &&
              x.references.subsetOf(right.outputSet)) Some((y, x, w))
            else None
          }
        }.nextOption()
      eligible match {
        case None => j
        case Some((ta, tb, w)) =>
          val wl = Literal(w, LongType)
          val bl = IntegralDivide(ta, wl)
          val bandL = AttributeReference("__graft_band", LongType)()
          val exploded = Generate(
            Explode(CreateArray(Seq(
              Subtract(bl, Literal(1L)), bl, Add(bl, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bandL), child = left)
          val bandR = Alias(IntegralDivide(tb, wl), "__graft_band")()
          val projected = Project(right.output :+ bandR, right)
          val newCond = And(EqualTo(bandL, bandR.toAttribute), cond)
          Project(j.output,
            Join(exploded, projected, Inner, Some(newCond), hint))
      }
  }
}
