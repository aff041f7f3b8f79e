package graft.plans

import graft.operators.JoinAdvisor

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, HintInfo, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** ADVISOR AUTO-APPLY — the closed CBO loop over the `_advisor`
  * sidecars ([[JoinAdvisor.analyzeTable]]'s ANALYZE artifact): an
  * opt-in optimizer rule (`spark.graft.advisor.auto = true`) that
  * consults the stored per-(table, key) row statistics AT PLANNING
  * TIME and pins a broadcast hint on a join side the stats prove
  * small — the same decision [[JoinAdvisor.advisedJoin]] makes
  * explicitly, now reachable from plain SQL with no API call.
  *
  * Why this matters beyond Spark's own size estimate: the planner
  * broadcasts from file `sizeInBytes`, which (a) measures compressed
  * bytes, not join-side rows, and (b) is unavailable or wildly
  * conservative for relations whose scan root is fronted by other
  * operators. The sidecar carries ROW counts from an ANALYZE pass, so
  * the hint fires exactly where a human reading `q_join_cardinality`
  * would have written `broadcast(...)`.
  *
  * Soundness contract (hint-only, stats-staleness-safe):
  *   - only BROADCAST decisions apply — a hint changes strategy, never
  *     rows, so a stale sidecar costs performance, not correctness
  *     (the salt tier demotes to Plain under AQE anyway, measured in
  *     BENCH_NOTES r8);
  *   - stats bind to a side only when it is a BARE scan of the
  *     analyzed table (aliases and column-pruning projects allowed —
  *     they preserve cardinality; a Filter invalidates row counts, so
  *     filtered sides never consult the sidecar);
  *   - existing hints win: the rule never overrides a user's
  *     `/*+ BROADCAST */` or `NO_BROADCAST_HASH`.
  */
object AdvisorApply extends Rule[LogicalPlan] {

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.advisor.auto").contains("true")

  private def broadcastBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.advisor.broadcastBytes")
      .map(_.toLong).getOrElse(10L * 1024 * 1024)

  /** The table directory under a bare (cardinality-preserving) plan:
    * aliases/projects pass through, anything else declines. */
  private def scanPath(p: LogicalPlan): Option[String] = p match {
    case SubqueryAlias(_, child) => scanPath(child)
    case Project(_, child) => scanPath(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
    case r: DataSourceV2Relation => r.table match {
      case t: graft.sources.TimeTravelTable => Some(t.tablePath)
      case _ => None
    }
    case _: LFilter => None // row stats no longer hold below a filter
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.active
    if (!enabled(spark)) return plan
    val bb = broadcastBytes(spark)
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(EqualTo(a: AttributeReference, b: AttributeReference)),
          JoinHint(None, None)) =>
        val (lKey, rKey) =
          if (l.outputSet.contains(a) && r.outputSet.contains(b)) (a.name, b.name)
          else if (l.outputSet.contains(b) && r.outputSet.contains(a)) (b.name, a.name)
          else ("", "")
        val decision = for {
          lp <- scanPath(l)
          rp <- scanPath(r)
          if lKey.nonEmpty
          ls <- JoinAdvisor.statsFor(spark, lp, lKey)
          rs <- JoinAdvisor.statsFor(spark, rp, rKey)
        } yield JoinAdvisor.choose(ls, rs, broadcastBytes = bb)
        decision match {
          case Some(JoinAdvisor.BroadcastLeft) =>
            j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
          case Some(JoinAdvisor.BroadcastRight) =>
            j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
          case _ => j // Plain / Salt-demoted / no stats: leave AQE in charge
        }
    }
  }
}
