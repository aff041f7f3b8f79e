package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, TimestampType}

/** Automatic binned-interval-join rewrite (§4 optimizer-rule tier) —
  * the injected-rule face of
  * [[graft.operators.RangeJoinOps.binnedPointInterval]]: a user who
  * naively writes a PURE inequality inner join
  *
  *   points.join(intervals, p >= s && p < e)        -- no equi key
  *
  * would get Spark's only native plan for it, a nested loop
  * (BroadcastNestedLoopJoin), which at 100 TB is not slow but
  * impossible. This rule detects the shape — an integral expression of
  * one side bounded below AND above by integral expressions of the
  * other, with NO cross-side equality conjunct anywhere (if one
  * exists, Spark already plans a hash/merge join and the range is a
  * cheap post-filter) — and rewrites it into the bin equi-join:
  * intervals explode onto the fixed-width bins they overlap, points
  * carry their single bin, the bins equi-join (shuffle or broadcast,
  * the planner's choice), and the ORIGINAL join condition re-filters
  * inside matching bins.
  *
  * Soundness: the bin candidate set is a SUPERSET of the matching set
  * (bins span `floor(s/W) .. floor(e/W)` whatever the bounds'
  * strictness — `x ↦ floor(double(x)/W)` is monotonic, so
  * s ≤ p ≤ e pins p's bin inside the interval's range even past
  * double-precision magnitudes), the full original predicate re-runs
  * on every candidate, and a qualifying pair meets on EXACTLY one bin
  * (the point's), so no duplicates — aggregates stay exact. Reversed
  * (empty) intervals produce an empty bin array instead of a
  * descending sequence. NULL bounds drop the row on both the original
  * and the rewritten path (null comparison vs null bin key).
  *
  * Bin width comes from `spark.graft.rangeJoin.binWidth` (default 64,
  * caller's integer unit — days, seconds, ids): pick ≈ the typical
  * interval span; wider bins mean fewer duplicate interval rows, more
  * false candidates. The rule is excludable like any other
  * (`spark.sql.optimizer.excludedRules=graft.plans.BinnedRangeJoin`),
  * and a span/W over Spark's sequence length limit fails loudly at
  * runtime rather than silently truncating.
  */
object BinnedRangeJoin extends Rule[LogicalPlan] {

  val BinWidthConf = "spark.graft.rangeJoin.binWidth"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** TIMESTAMP bounds also bin soundly — `Cast(ts, double)` is epoch
    * SECONDS and monotonic, so the superset argument holds unchanged —
    * but the bin unit silently becomes seconds, where the 64-default
    * would explode a 30-day interval into 40k bins. Temporal rewrites
    * therefore fire only when the session EXPLICITLY sets
    * [[BinWidthConf]] (in seconds), an intent signal that the caller
    * chose a width for their time scale. */
  private def temporal(e: Expression): Boolean = e.dataType == TimestampType

  /** (point, low, high) when `c` is a one-sided bound between the two
    * child outputs: returns the bounded expression and its bound. */
  private final case class Bound(point: Expression, limit: Expression, isLower: Boolean)

  private def asBound(c: Expression): Option[Bound] = c match {
    case GreaterThanOrEqual(a, b) => Some(Bound(a, b, isLower = true))
    case GreaterThan(a, b)        => Some(Bound(a, b, isLower = true))
    case LessThanOrEqual(a, b)    => Some(Bound(a, b, isLower = false))
    case LessThan(a, b)           => Some(Bound(a, b, isLower = false))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val parts = conjuncts(cond)
      def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left-only
        val refs = e.references
        if (refs.isEmpty) None
        else if (refs.subsetOf(left.outputSet)) Some(true)
        else if (refs.subsetOf(right.outputSet)) Some(false)
        else None
      }
      val hasCrossEquality = parts.exists {
        case EqualTo(a, b) => (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
        case EqualNullSafe(a, b) => (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
        case _ => false
      }
      if (hasCrossEquality) j
      else {
        // normalize every comparison into "point-side bounded by
        // other-side", in both orientations (s <= p is a lower bound)
        val widthExplicit = conf.getConfString(BinWidthConf, null) != null
        def binnable(e: Expression): Boolean =
          integral(e) || (temporal(e) && widthExplicit)
        val bounds = parts.flatMap(asBound).flatMap { b =>
          (sideOf(b.point), sideOf(b.limit)) match {
            case (Some(ps), Some(ls)) if ps != ls &&
                binnable(b.point) && binnable(b.limit) =>
              Seq(Bound(b.point, b.limit, b.isLower),
                Bound(b.limit, b.point, !b.isLower)).filter(x =>
                  sideOf(x.point).isDefined) // keep both orientations
            case _ => Nil
          }
        }
        // one point expression with BOTH a lower and an upper bound —
        // scanned in the ORIGINAL conjunct order (a groupBy Map's
        // iteration order is arbitrary, and with several qualifying
        // expressions the choice of which side gets binned must not
        // depend on hash iteration)
        val grouped = bounds.groupBy(b => (b.point.canonicalized, sideOf(b.point)))
        val candidate = bounds.view
          .map(b => (b.point.canonicalized, sideOf(b.point)))
          .distinct
          .map(grouped)
          .collectFirst {
            case bs if bs.exists(_.isLower) && bs.exists(!_.isLower) =>
              val p = bs.head.point
              (p, bs.find(_.isLower).get.limit, bs.find(!_.isLower).get.limit,
                sideOf(p).get)
          }
        candidate match {
          case None => j
          case Some((p, lo, hi, pointOnLeft)) =>
            val w = conf.getConfString(BinWidthConf, "64").toLong
            require(w > 0, s"$BinWidthConf must be positive, got $w")
            def binOf(x: Expression): Expression =
              Cast(Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble))), LongType)

            val binAlias = Alias(binOf(p), "_graft_bin")()
            def pointSide(child: LogicalPlan): (LogicalPlan, Attribute) =
              (Project(child.output :+ binAlias, child), binAlias.toAttribute)

            def intervalSide(child: LogicalPlan): (LogicalPlan, Attribute) = {
              val loBin = binOf(lo)
              val hiBin = binOf(hi)
              // Sequence is TimeZoneAware: resolution needs an explicit
              // zone even for pure long sequences
              val bins = If(LessThanOrEqual(loBin, hiBin),
                new Sequence(loBin, hiBin, Some(Literal(1L)),
                  Some(conf.sessionLocalTimeZone)),
                Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
              val binsAlias = Alias(bins, "_graft_bins")()
              val proj = Project(child.output :+ binsAlias, child)
              val genOut = AttributeReference("_graft_bin_iv", LongType,
                nullable = false)()
              (Generate(Explode(binsAlias.toAttribute), unrequiredChildIndex = Nil,
                outer = false, qualifier = None, generatorOutput = Seq(genOut),
                child = proj), genOut)
            }

            val ((newLeft, binL), (newRight, binR)) =
              if (pointOnLeft) (pointSide(left), intervalSide(right))
              else (intervalSide(left), pointSide(right))
            val rewritten = Join(newLeft, newRight, Inner,
              Some(And(EqualTo(binL, binR), cond)), hint)
            // strip the helper bin columns; original attrs keep their ids
            Project(j.output, rewritten)
        }
      }
  }
}
