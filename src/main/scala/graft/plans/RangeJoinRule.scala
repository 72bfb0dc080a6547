package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, ByteType}

/** Optimizer rule that makes naive range joins scale.
  *
  * A join whose condition is ONLY `p >= lo AND p <= hi` (point from one
  * side, interval bounds from the other) has no equi-key, so Spark plans a
  * nested-loop join — O(n·m) row comparisons, a broadcast requirement, and
  * a driver OOM at scale. This rule rewrites the logical plan into the
  * bucketed form (the same shape `graft.operators.RangeJoin` builds by
  * hand): quantize the domain into fixed-width buckets, explode each
  * interval to the buckets it covers, equi-join point buckets to interval
  * buckets, and re-apply the exact predicate as a refine filter. The
  * result is hash-partitionable, spillable, AQE-skew-handled — everything
  * an equi-join gets for free.
  *
  * The rewrite fires only when:
  *   - the join is INNER with a pure two-sided range condition on one
  *     integral point attribute (one lower + one upper bound, no other
  *     cross-side conjuncts — an equi conjunct means the built-in hash
  *     join already handles it);
  *   - both sides' size estimates exceed the auto-broadcast threshold
  *     (below it, the built-in broadcast nested-loop is perfectly fine
  *     and cheaper than two exchanges).
  *
  * Bucket width comes from `spark.graft.rangejoin.bucketWidth` (default
  * 1024); pick ≈ the median interval width. Floor-division is implemented
  * as `(x - pmod(x, w)) div w`, which is a true floor for negative
  * domains too (IntegralDivide alone truncates toward zero).
  *
  * Registered through [[GraftExtensions]]:
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {
  val WidthKey = "spark.graft.rangejoin.bucketWidth"
  val DefaultWidth = 1024L

  private def width: Long =
    SQLConf.get.getConfString(WidthKey, DefaultWidth.toString).toLong

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (x - pmod(x, w)) div w — floor division in Catalyst expressions. */
  private def floorDiv(x: Expression, w: Long): Expression = {
    val xl = Cast(x, LongType)
    val wl = Literal(w, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, wl)), wl)
  }

  /** One cross-side comparison, normalized to (point, bound, isLower). */
  private def asRangeBound(e: Expression, pointSide: LogicalPlan,
      boundSide: LogicalPlan): Option[(Attribute, Expression, Boolean)] = {
    def fromPoint(a: Expression) = a match {
      case attr: Attribute if pointSide.outputSet.contains(attr) => Some(attr)
      case _ => None
    }
    def fromBound(b: Expression) =
      b.references.nonEmpty && b.references.subsetOf(boundSide.outputSet)
    e match {
      case GreaterThanOrEqual(a, b) =>
        fromPoint(a).filter(_ => fromBound(b)).map((_, b, true))
      case GreaterThan(a, b) =>
        fromPoint(a).filter(_ => fromBound(b)).map((_, b, true))
      case LessThanOrEqual(a, b) =>
        fromPoint(a).filter(_ => fromBound(b)).map((_, b, false))
      case LessThan(a, b) =>
        fromPoint(a).filter(_ => fromBound(b)).map((_, b, false))
      case GreaterThanOrEqual(b, a) =>
        fromPoint(a).filter(_ => fromBound(b)).map((_, b, false))
      case GreaterThan(b, a) =>
        fromPoint(a).filter(_ => fromBound(b)).map((_, b, false))
      case LessThanOrEqual(b, a) =>
        fromPoint(a).filter(_ => fromBound(b)).map((_, b, true))
      case LessThan(b, a) =>
        fromPoint(a).filter(_ => fromBound(b)).map((_, b, true))
      case _ => None
    }
  }

  /** Try to read `conjuncts` as a bounded range of one point attribute of
    * `pointSide` against interval bounds from `boundSide`. */
  private def matchRange(conjuncts: Seq[Expression], pointSide: LogicalPlan,
      boundSide: LogicalPlan): Option[(Attribute, Expression, Expression)] = {
    val bounds = conjuncts.map(asRangeBound(_, pointSide, boundSide))
    if (bounds.exists(_.isEmpty)) return None
    bounds.flatten match {
      case Seq((p1, lo, true), (p2, hi, false)) if p1.semanticEquals(p2) &&
          isIntegral(p1) && isIntegral(lo) && isIntegral(hi) =>
        Some((p1, lo, hi))
      case Seq((p1, hi, false), (p2, lo, true)) if p1.semanticEquals(p2) &&
          isIntegral(p1) && isIntegral(lo) && isIntegral(hi) =>
        Some((p1, lo, hi))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val broadcastable = {
        val thr = SQLConf.get.autoBroadcastJoinThreshold
        thr > 0 && (left.stats.sizeInBytes <= thr ||
          right.stats.sizeInBytes <= thr)
      }
      if (broadcastable) j
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        // every conjunct must span both sides (single-side predicates have
        // been pushed below the join by this point in the optimizer)
        val rewritten =
          matchRange(conjuncts, left, right).map { case (p, lo, hi) =>
            rewrite(j, pointPlan = left, intervalPlan = right, p, lo, hi,
              pointIsLeft = true)
          }.orElse {
            matchRange(conjuncts, right, left).map { case (p, lo, hi) =>
              rewrite(j, pointPlan = right, intervalPlan = left, p, lo, hi,
                pointIsLeft = false)
            }
          }
        rewritten.getOrElse(j)
      }
  }

  private def rewrite(j: Join, pointPlan: LogicalPlan,
      intervalPlan: LogicalPlan, p: Attribute, lo: Expression,
      hi: Expression, pointIsLeft: Boolean): LogicalPlan = {
    val w = width
    val pb = Alias(floorDiv(p, w), "__graft_pb")()
    val pointProj = Project(pointPlan.output :+ pb, pointPlan)
    // timeZoneId must be set for TimeZoneAwareExpression.resolved even on
    // integral sequences — an optimizer rule runs post-analysis, so no one
    // will fill it in for us
    val seq = Sequence(floorDiv(lo, w), floorDiv(hi, w), None,
      Some(SQLConf.get.sessionLocalTimeZone))
    val ib = AttributeReference("__graft_ib", LongType, nullable = false)()
    val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ib),
      child = intervalPlan)
    val (l, r) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
    val bucketJoin = Join(l, r, Inner,
      Some(EqualTo(pb.toAttribute, ib)), JoinHint.NONE)
    // re-apply the exact range predicate; bucket equality is a superset
    Project(j.output, Filter(j.condition.get, bucketJoin))
  }
}

/** Engine extension entry point: planner strategy for the custom as-of
  * operator plus the range-join optimizer rule. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or pass to
  * `SparkSession.builder.withExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfStrategy)
    ext.injectOptimizerRule(_ => RangeJoinRule)
    ext.injectOptimizerRule(_ => ViewRewrite)
  }
}
