package graft.engine.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite an interval ("band") join —
  * `a JOIN b ON abs(x − y) <= c` with x from one side, y from the
  * other, c a positive literal — into a bucketed EQUI-join.
  *
  * Without the rewrite Spark has no equi-key and plans
  * BroadcastNestedLoopJoin: O(N·M) comparisons, dead at scale. The
  * rewrite buckets both sides on `floor(value / 2c)` — bucket width 2c
  * means matching pairs sit at most one bucket apart even under
  * floating-point division error (|x−y| ≤ c ⇒ |x/2c − y/2c| ≤ 0.5+ε)
  * — explodes the probe side to bucket±1, joins on bucket equality,
  * and keeps the original predicate as the exact residual filter. Cost
  * drops from N·M to the true candidate count; results are identical
  * (the residual filter is unchanged).
  *
  * The rule fires only on INNER joins whose condition has no existing
  * equi-conjunct (those already hash-join) and leaves every other plan
  * untouched. Registered via
  * [[graft.engine.functions.GraftExtensions]] —
  * `spark.sql.extensions` config, no code changes at call sites: any
  * user's raw band join gets the scalable plan. This is the
  * §2.B `join_range_bucket` rewrite, promoted from a hand-written
  * pattern to an automatic optimization (`join_band_auto` gates it).
  */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def litDouble(l: Literal): Option[Double] = l.value match {
    case v: java.lang.Number => Some(v.doubleValue())
    case v: org.apache.spark.sql.types.Decimal => Some(v.toDouble)
    case _ => None
  }

  /** Extract (x, y, c) from `abs(x − y) <= c` (either literal side). */
  private def bandPair(e: Expression): Option[(Expression, Expression, Double)] =
    e match {
      case LessThanOrEqual(a: Abs, l: Literal) =>
        (a.child match {
          case s: Subtract => Some((s.left, s.right))
          case _ => None
        }).flatMap { case (x, y) => litDouble(l).filter(_ > 0).map((x, y, _)) }
      case GreaterThanOrEqual(l: Literal, a: Abs) =>
        bandPair(LessThanOrEqual(a, l))
      case _ => None
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def crossSide(a: Expression, b: Expression): Boolean =
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(a, right) && canEvaluate(b, left))
      // any existing equi-conjunct (incl. null-safe) already hash-joins;
      // rewriting on top would only triple the probe side
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => crossSide(a, b)
        case EqualNullSafe(a, b) => crossSide(a, b)
        case _ => false
      }
      val band =
        if (hasEqui) None
        else conjuncts.flatMap(bandPair).collectFirst {
          case (x, y, c) if canEvaluate(x, left) && canEvaluate(y, right) => (x, y, c)
          case (x, y, c) if canEvaluate(x, right) && canEvaluate(y, left) => (y, x, c)
        }
      band match {
        case Some((lx, ry, c)) =>
          val width = Literal(2.0 * c)
          def bucket(e: Expression): Expression =
            Floor(Divide(Cast(e, DoubleType), width))
          val probeAttr = AttributeReference("__graft_band_probe", LongType)()
          val b = bucket(lx)
          val probes = CreateArray(Seq(
            Subtract(b, Literal(1L)), b, Add(b, Literal(1L))))
          val newLeft =
            Generate(Explode(probes), Nil, outer = false, None, Seq(probeAttr), left)
          val bucketAlias = Alias(bucket(ry), "__graft_band_bucket")()
          val newRight = Project(right.output :+ bucketAlias, right)
          val newCond = And(EqualTo(probeAttr, bucketAlias.toAttribute), cond)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
