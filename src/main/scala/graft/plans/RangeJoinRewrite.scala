package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite a pure range join — an INNER join
  * whose only join predicates are `pt >= lo AND pt <= hi` with the
  * point expression from one side and both bounds from the other —
  * into the bucketized equi-join [[graft.ops.RangeJoin]] spells by
  * hand. Spark plans the bare inequality join as
  * BroadcastNestedLoopJoin or a cartesian product (O(n·m)
  * comparisons); after the rewrite it hash-partitions on a bucket
  * key: the bound side explodes to the buckets its interval covers,
  * the point side keys by its single bucket, and the ORIGINAL
  * predicates filter the survivors — identical rows, shuffle-join
  * cost.
  *
  * Soundness: bucketing B(x) = floor(cast(x as double) / w) is
  * MONOTONE non-decreasing (division by a positive constant and
  * floor both are, and IEEE double rounding preserves order), so
  * lo <= pt <= hi implies B(lo) <= B(pt) <= B(hi) — every qualifying
  * pair meets in the point's bucket, no false negatives regardless
  * of floating-point boundary rounding. False positives are removed
  * by the original predicates, kept verbatim in the new join
  * condition. An empty interval (lo > hi) generates NO buckets (the
  * guarded sequence), exactly matching the inner join's empty
  * result. NULL point/bounds produce NULL buckets / NULL sequences,
  * which the equi-join and Explode drop — the same rows the original
  * NULL comparisons dropped.
  *
  * OPT-IN: active only when `spark.graft.rangeJoin.bucketWidth` is a
  * positive number — width is a data-dependent choice (pick it near
  * the typical interval width: per-row fan-out is interval/width + 2,
  * the [[graft.ops.RangeJoin]] guidance). Joins that already carry an
  * equi predicate are left alone (Spark hash-joins those fine, and
  * this also makes the rule idempotent at the optimizer's fixed
  * point: the rewritten join contains the bucket equality).
  *
  * Wire it via `spark.sql.extensions=graft.GraftExtensions`, or on a
  * live session via
  * `spark.experimental.extraOptimizations ++= Seq(RangeJoinRewrite(spark))`.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.bucketWidth"

  private def width: Option[Double] =
    spark.conf.getOption(ConfKey).map { s =>
      val w = java.lang.Double.parseDouble(s)
      require(w > 0 && !w.isInfinite,
        s"$ConfKey must be a positive finite number, got '$s'")
      w
    }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, w).getOrElse(j)
    }
  }

  /** (point, lower, upper, lowerInclusive?, upperInclusive?) — not
    * needed beyond sides/types: the original comparisons are kept
    * verbatim, only the bucket equality is ADDED. */
  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sided(e: Expression): Option[Boolean] = {
      // Some(true) = references only the left side (and at least one)
      val r = e.references
      if (r.isEmpty || !e.deterministic) None
      else if (r.subsetOf(left.outputSet)) Some(true)
      else if (r.subsetOf(right.outputSet)) Some(false)
      else None
    }
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sided(a), sided(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case EqualNullSafe(a, b) =>
        (sided(a), sided(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    def numeric(e: Expression) = e.dataType.isInstanceOf[NumericType]
    // normalize each comparison to (pt, bound, isLower)
    def asBound(c: Expression): Option[(Expression, Expression, Boolean)] =
      c match {
        case GreaterThanOrEqual(a, b) => Some((a, b, true))
        case GreaterThan(a, b) => Some((a, b, true))
        case LessThanOrEqual(a, b) => Some((a, b, false))
        case LessThan(a, b) => Some((a, b, false))
        case _ => None
      }
    // a candidate lower/upper pair: same pt expression (semantic
    // equality), bounds on the opposite side of pt. EVERY comparison
    // yields BOTH operand-role interpretations (pt >= lo is also
    // lo <= pt with the roles swapped — which operand is "the point"
    // only becomes clear when a lower and an upper interpretation
    // share a pt); the pairing step below disambiguates.
    val bounds = conjuncts.flatMap { c =>
      asBound(c).toSeq.flatMap { case (a, b, aIsPt) =>
        Seq((a, b, aIsPt), (b, a, !aIsPt)).collect {
          case (pt, bound, isLower)
              if numeric(pt) && numeric(bound) &&
                sided(pt).isDefined && sided(bound).isDefined &&
                sided(pt) != sided(bound) =>
            (pt, bound, isLower)
        }
      }
    }
    val pair = bounds.collectFirst {
      case lower @ (pt, _, true)
          if bounds.exists(u => !u._3 && u._1.semanticEquals(pt)) =>
        (pt, lower._2, bounds.find(u => !u._3 && u._1.semanticEquals(pt)).get._2)
    }
    pair.flatMap { case (pt, lo, hi) =>
      val ptOnLeft = sided(pt).get
      val (ptPlan, boundPlan) = if (ptOnLeft) (left, right) else (right, left)
      val wLit = Literal(w, DoubleType)
      // Cast and Sequence are TimeZoneAwareExpressions: the analyzer's
      // ResolveTimeZone normally fills timeZoneId, but an optimizer
      // rule constructs POST-analysis nodes — without an explicit zone
      // they report unresolved and plan validation rejects the rewrite
      val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
      def bucketOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType, tz), wLit))
      val ptBucket = Alias(bucketOf(pt), "__g_rj_b_pt")()
      val ptSide = Project(ptPlan.output :+ ptBucket, ptPlan)
      val bLo = bucketOf(lo)
      val bHi = bucketOf(hi)
      // guarded sequence: an empty interval yields an empty array
      // (Sequence would ERROR on start > stop with a +1 step)
      val seq = If(LessThanOrEqual(bLo, bHi),
        Sequence(bLo, bHi, Some(Literal(1L)), tz),
        Literal.create(Seq.empty[Long], ArrayType(LongType, false)))
      val bucketAttr =
        AttributeReference("__g_rj_b_rng", LongType, nullable = false)()
      val boundSide = Generate(Explode(seq), Nil, outer = false, None,
        Seq(bucketAttr), boundPlan)
      val newCond = (EqualTo(ptBucket.toAttribute, bucketAttr) +: conjuncts)
        .reduce(And)
      val (nl, nr) = if (ptOnLeft) (ptSide, boundSide) else (boundSide, ptSide)
      Some(Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint)))
    }
  }
}
