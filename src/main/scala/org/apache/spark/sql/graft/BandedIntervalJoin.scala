package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure proximity join
  * `a JOIN b ON abs(x_a - x_b) <= gap` — which Spark can only plan as a
  * (broadcast) nested loop, quadratic in input — into the banded
  * equi-join `graft.operators.RangeJoin` builds by hand: both sides are
  * bucketed to gap-sized bins, the left expands to its bin ± 1 (map-side
  * Generate, not a shuffle), and the join becomes a hash equi-join on
  * the bin with the original band predicate kept as the residual
  * condition. Any qualifying pair is at most one bin apart, so the
  * rewrite is semantics-preserving.
  *
  * Applies only when the join has NO other equi conjunct: with an equi
  * key present Spark already plans a hash join and the band is a cheap
  * residual. Idempotent — the rewritten join contains a bin equality, so
  * it no longer matches.
  */
object BandedIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def positiveLit(e: Expression): Option[Double] = e match {
    case Literal(v: Byte, _)   => Some(v.toDouble).filter(_ > 0)
    case Literal(v: Short, _)  => Some(v.toDouble).filter(_ > 0)
    case Literal(v: Int, _)    => Some(v.toDouble).filter(_ > 0)
    case Literal(v: Long, _)   => Some(v.toDouble).filter(_ > 0)
    case Literal(v: Float, _)  => Some(v.toDouble).filter(_ > 0)
    case Literal(v: Double, _) => Some(v).filter(_ > 0)
    case _                     => None
  }

  /** `abs(a - b) <= gap` (or `gap >= abs(a - b)`) with a positive
    * numeric literal gap.
    */
  private def matchBand(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case LessThanOrEqual(Abs(Subtract(a, b, _), _), g) => positiveLit(g).map((a, b, _))
    case GreaterThanOrEqual(g, Abs(Subtract(a, b, _), _)) => positiveLit(g).map((a, b, _))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        case _ => false
      }
      val band = if (hasEqui) None else conjuncts.iterator.map(matchBand).collectFirst {
        case Some((a, b, g))
          if a.deterministic && b.deterministic &&
             a.references.subsetOf(left.outputSet) &&
             b.references.subsetOf(right.outputSet) => (a, b, g)
        case Some((a, b, g))
          if a.deterministic && b.deterministic &&
             b.references.subsetOf(left.outputSet) &&
             a.references.subsetOf(right.outputSet) => (b, a, g)
      }
      band match {
        case None => j
        case Some((la, ra, gap)) =>
          val gapLit = Literal(gap, DoubleType)
          def binOf(x: Expression): Expression =
            Floor(Divide(Cast(x, DoubleType), gapLit)) // LongType out
          val lBin = binOf(la)
          val lBinAttr = AttributeReference("__graft_lbin", LongType)()
          val expanded = Generate(
            Explode(CreateArray(Seq(
              Subtract(lBin, Literal(1L)), lBin, Add(lBin, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(lBinAttr), child = left)
          val rBinAlias = Alias(binOf(ra), "__graft_rbin")()
          val binned = Project(right.output :+ rBinAlias, right)
          val newCond = (conjuncts :+ EqualTo(lBinAttr, rBinAlias.toAttribute))
            .reduce(And)
          Project(j.output, Join(expanded, binned, Inner, Some(newCond), hint))
      }
  }
}
