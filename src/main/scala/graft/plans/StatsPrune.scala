package graft.plans

import graft.sources.{TimeTravel, TimeTravelTable}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** AUTOMATIC file skipping for the DSv2 time-travel scan (§4
  * optimizer-rule tier, the [[DvApply]] pattern): a Filter over a
  * `graft-table` relation whose conjuncts bound a STATS-COVERED column
  * is re-planned against the snapshot's per-file min/max sidecars —
  * the relation is substituted by a parquet scan of ONLY the files
  * whose recorded range overlaps the bounds, the filter stays on top
  * as the exact residual, and `WHERE dd BETWEEN x AND y` in plain SQL
  * reads ⌈selectivity · files⌉ with zero user action. This is what
  * Delta/Iceberg do with add-file stats at planning time, recovered as
  * an injected rule over the homegrown format ([[TimeTravel]]).
  *
  * Equality probes get a second tier: a conjunct pinning a
  * BLOOM-covered column to one value admits files through the per-file
  * Bloom sidecar (no false negatives) — the bloom-column-index shape,
  * for point lookups on columns the layout was never clustered by,
  * where every file's [min, max] spans the domain and range stats
  * prune nothing. Range skipping is tried first; the bloom tier fires
  * when it declines.
  *
  * Sound-or-decline, like every rule in this library: only bare
  * integral-column comparisons with integral literals are read as
  * bounds (casts, expressions, OR-trees decline); files of directories
  * WITHOUT a sidecar are always kept; a DV-bearing snapshot is left
  * for [[DvApply]] (its anti-join consumes the same relation); and the
  * residual filter re-applies the exact predicate, so a sidecar that
  * over-approximates costs reads, never rows. An all-files-overlap
  * probe declines too — the plan only changes when skipping actually
  * skips (also what makes the rewrite idempotent under the optimizer's
  * fixed point). A probe that overlaps NOTHING becomes an empty
  * [[LocalRelation]] on the relation's own attributes: the 100 TB
  * wrong-date-range query costs zero tasks.
  *
  * Scale: planning reads the snapshot's O(files) sidecars on the
  * driver — the same cost class as any table format's manifest
  * pruning — and the substituted scan is declarative, so column
  * pruning and the residual's parquet pushdown keep working below the
  * splice.
  */
object StatsPrune extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, r @ DataSourceV2Relation(t: TimeTravelTable, _, _, _, _, _))
        if !t.pendingDvs =>
      try rewrite(f, cond, r, t) catch {
        // a malformed sidecar must degrade to the unpruned scan, never
        // fail planning
        case scala.util.control.NonFatal(_) => f
      }
  }

  private def rewrite(f: Filter, cond: Expression, r: DataSourceV2Relation,
      t: TimeTravelTable): LogicalPlan = {
    val spark = SparkSession.active
    val bounds = boundsOf(cond, r.output)
    if (bounds.isEmpty) return f
    // a contradictory window (x > 5 AND x < 3) is unsatisfiable
    // regardless of any sidecar: zero-task empty relation
    if (bounds.exists { case (_, (lo, hi)) => lo > hi })
      return Filter(cond, LocalRelation(r.output, Seq.empty, isStreaming = false))
    // CONJUNCTIVE multi-probe: every bounded stats-covered column
    // contributes a range, every pinned bloom-covered column a point —
    // the admitted sets intersect, so a 2-D WHERE over a Z-ordered
    // layout prunes on both dimensions at once
    val statsCov = TimeTravel.statsColumns(spark, t.tablePath, t.snapshotVersion)
      .collect { case (c, IntegerType | LongType | ShortType) => c }.toSet
    val bloomCov = TimeTravel.bloomColumns(spark, t.tablePath, t.snapshotVersion)
    val ranges = bounds.collect { case (c, (lo, hi)) if statsCov(c) => (c, lo, hi) }
    val points = bounds.collect { case (c, (lo, hi)) if lo == hi && bloomCov(c) => (c, lo) }
    if (ranges.isEmpty && points.isEmpty) return f
    val (files, st) = TimeTravel.planProbes(
      spark, t.tablePath, t.snapshotVersion, ranges, points)
    substituted(spark, cond, r, files, st).getOrElse(f)
  }

  /** The shared splice: Filter(cond, Project(aliases, parquet scan of
    * `files`)) with the relation's own exprIds, or an empty relation
    * when nothing overlaps; None (decline) when nothing is skipped or
    * the name mapping fails. */
  private def substituted(spark: SparkSession, cond: Expression,
      r: DataSourceV2Relation, files: Seq[String],
      st: graft.sources.ZoneMaps.PruneStats): Option[LogicalPlan] = {
    if (files.isEmpty)
      Some(Filter(cond, LocalRelation(r.output, Seq.empty, isStreaming = false)))
    else if (st.filesRead >= st.filesTotal) None // nothing skipped: keep the plan
    else {
      val sub = spark.read.parquet(files: _*).queryExecution.analyzed
      val byName = sub.output.map(a => a.name -> a).toMap
      if (r.output.forall(a => byName.contains(a.name))) {
        val aliases: Seq[NamedExpression] = r.output.map { a =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        }
        Some(Filter(cond, Project(aliases, sub)))
      } else None
    }
  }

  /** The [lo, hi] window each directly-compared integral column is
    * confined to by `cond`'s AND-conjuncts: `c >= l`, `c > l`,
    * `c <= l`, `c < l`, `c = l` in either operand order; everything
    * else contributes nothing (an unrelated conjunct never widens a
    * window — it can only be residual). Columns appear only when at
    * least one side is bounded. */
  private def boundsOf(cond: Expression,
      output: Seq[Attribute]): Seq[(String, (Long, Long))] = {
    val names = output.map(a => a.exprId -> a.name).toMap
    def longOf(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.longValue)
      case j: java.lang.Long    => Some(j)
      case s: java.lang.Short   => Some(s.longValue)
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val win = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Long)]
    def tighten(a: Attribute, lo: Option[Long], hi: Option[Long]): Unit =
      names.get(a.exprId).foreach { n =>
        val (l0, h0) = win.getOrElse(n, (Long.MinValue, Long.MaxValue))
        win(n) = (lo.fold(l0)(math.max(l0, _)), hi.fold(h0)(math.min(h0, _)))
      }
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(a: Attribute, l: Literal) => tighten(a, longOf(l), None)
      case GreaterThan(a: Attribute, l: Literal) => tighten(a, longOf(l).map(_ + 1), None)
      case LessThanOrEqual(a: Attribute, l: Literal) => tighten(a, None, longOf(l))
      case LessThan(a: Attribute, l: Literal) => tighten(a, None, longOf(l).map(_ - 1))
      case EqualTo(a: Attribute, l: Literal) => tighten(a, longOf(l), longOf(l))
      case GreaterThanOrEqual(l: Literal, a: Attribute) => tighten(a, None, longOf(l))
      case GreaterThan(l: Literal, a: Attribute) => tighten(a, None, longOf(l).map(_ - 1))
      case LessThanOrEqual(l: Literal, a: Attribute) => tighten(a, longOf(l), None)
      case LessThan(l: Literal, a: Attribute) => tighten(a, longOf(l).map(_ + 1), None)
      case EqualTo(l: Literal, a: Attribute) => tighten(a, longOf(l), longOf(l))
      case _ => ()
    }
    win.toSeq.filter { case (_, (lo, hi)) =>
      lo != Long.MinValue || hi != Long.MaxValue
    }
  }
}
