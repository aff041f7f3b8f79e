package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** MATERIALIZED-VIEW auto-rewrite (§4 optimizer-rule tier, the
  * transparent half of the MV story whose maintenance half is
  * `q_incr_agg_merge`): a session registers an aggregate definition
  * plus its materialized parquet, and from then on ANY query whose
  * optimized aggregate subtree is plan-identical to the definition is
  * silently answered from the materialization instead of rescanning
  * the base table — the Calcite/BigQuery/Snowflake MV-matching design,
  * reduced to its sound core.
  *
  * Matching is by CANONICALIZED OPTIMIZED PLAN EQUALITY — the
  * definition is optimized by the same Catalyst pipeline at
  * registration, so alias names, projection order noise, and exprId
  * differences are normalized away. Four probes fire in order, each
  * sound-or-decline: EXACT match; FILTER subsumption (a narrowing
  * predicate on grouping columns re-applies over the MV); PROJECTION
  * subsumption (a column subset reads just those MV columns); and
  * ROLL-UP subsumption (a coarser grouping re-aggregates the MV —
  * non-distinct sum/count/min/max only). Anything outside what a
  * probe can prove — another aggregate, a predicate on non-grouping
  * columns, an avg/distinct fold — declines to the base table: the
  * rule can produce a wrong answer never, a missed opportunity
  * sometimes.
  *
  * The substituted scan keeps the original subtree's output exprIds
  * (fresh relation instance + positional aliases), so parent operators
  * resolve unchanged; a second reference to the same MV in one query
  * gets its own relation instance (no duplicate-attribute conflicts).
  *
  * Staleness contract: the catalog is SESSION-SCOPED and explicit —
  * registering is the caller's claim that the parquet is current
  * (refresh = re-register after running the incremental-merge
  * maintenance). `register` verifies the materialization's schema
  * matches the definition before accepting it.
  *
  * Scale: the entire point at 100 TB — a dashboard aggregate that
  * matches rewrites from a full fact scan to an O(groups) parquet
  * read; the rule itself inspects only Aggregate nodes and compares
  * against the (tiny) registry, so planning overhead is negligible.
  */
object MvCatalog {

  final case class Entry(
      name: String,
      canonical: LogicalPlan,
      relation: LogicalRelation,
      mvPath: String,
      /** The definition's optimized top Aggregate, when the optimized
        * plan has that shape — the structural handle the projection-
        * subsumption probe needs (column positions, grouping exprs);
        * None degrades that probe, never correctness. */
      defAgg: Option[Aggregate],
      /** The decomposed piece state the maintenance tier materializes
        * for avg-bearing definitions ([[MvMaintenance]]'s `_state`
        * parquet): its relation plus, per avg column name, the
        * (sum, count) piece column names — what lets the roll-up
        * probe fold an Average soundly. None degrades the avg fold
        * to a decline, never correctness. */
      avgState: Option[(LogicalRelation, Map[String, (String, String)])] = None)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Materialize `defDf` to `path` and register it for rewriting. */
  def register(spark: SparkSession, name: String, defDf: DataFrame, path: String): Unit = {
    defDf.write.mode("overwrite").parquet(path)
    registerMaterialized(spark, name, defDf, path)
  }

  /** Register an ALREADY-materialized parquet for `defDf` — the
    * incremental-maintenance path ([[graft.streaming.MvStreams]]
    * publishes base ⊎ streamed deltas here instead of re-running the
    * definition). The schema must match the definition's (a
    * half-written or diverged materialization must not be served);
    * content currency is the caller's claim, per the staleness
    * contract above. */
  def registerMaterialized(spark: SparkSession, name: String, defDf: DataFrame,
      path: String): Unit =
    registerMaterializedWithState(spark, name, defDf, path, None)

  /** [[registerMaterialized]] plus the decomposed piece state the
    * incremental-maintenance tier keeps for avg-bearing definitions:
    * `statePieces` = (state parquet path, avg column → (sum, count)
    * piece names). With it registered, the roll-up probe can fold the
    * MV's averages from Σsum/Σcnt instead of declining. */
  def registerMaterializedWithState(spark: SparkSession, name: String,
      defDf: DataFrame, path: String,
      statePieces: Option[(String, Map[String, (String, String)])]): Unit = {
    val read = spark.read.parquet(path)
    val defTypes = defDf.schema.map(f => (f.name, f.dataType))
    val gotTypes = read.schema.map(f => (f.name, f.dataType))
    require(gotTypes == defTypes,
      s"materialization at $path reads back as $gotTypes, definition is $defTypes")
    val rel = read.queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation => lr
    }.getOrElse(throw new IllegalStateException(
      s"parquet read of $path did not produce a LogicalRelation"))
    // Derive the canonical from a FRESH optimization with the rewrite
    // rule suspended: with other MVs already registered, the
    // definition's own optimization could otherwise be rewritten into
    // one of THEM (exactly what the subsumption probes are for),
    // registering a mangled canonical that this definition's own
    // queries never exact-match again.
    val optimized = MvRewrite.whileSuspended {
      org.apache.spark.sql.GraftPlanApi
        .ofRows(spark, defDf.queryExecution.logical)
        .queryExecution.optimizedPlan
    }
    val avgState = statePieces.flatMap { case (statePath, pieces) =>
      spark.read.parquet(statePath).queryExecution.analyzed.collectFirst {
        case lr: LogicalRelation => (lr, pieces)
      }
    }
    entries.put(name,
      Entry(name, optimized.canonicalized, rel, path,
        optimized match { case a: Aggregate => Some(a); case _ => None },
        avgState))
  }

  def unregister(name: String): Unit = entries.remove(name)
  def clear(): Unit = entries.clear()
  def isEmpty: Boolean = entries.isEmpty

  private[plans] def lookup(canonical: LogicalPlan): Option[Entry] = {
    val it = entries.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.canonical == canonical) return Some(e)
    }
    None
  }

  private[plans] def allEntries: Seq[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.toSeq
  }
}

object MvRewrite extends Rule[LogicalPlan] {

  /** True while [[MvCatalog.registerMaterialized]] optimizes a
    * definition to derive its canonical — the rule must not rewrite
    * the plan it is trying to fingerprint. Thread-local: planning is
    * driver-side and registration is single-writer by contract. */
  private val suspended: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  private[plans] def whileSuspended[A](body: => A): A = {
    suspended.set(java.lang.Boolean.TRUE)
    try body finally suspended.set(java.lang.Boolean.FALSE)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.isEmpty || suspended.get()) plan
    else plan.transformUp {
      // MV definitions are aggregates; restricting the probe to
      // Aggregate nodes keeps the non-MV planning cost at zero
      case agg: Aggregate =>
        exactMatch(agg).orElse(filterSubsume(agg))
          .orElse(projectionSubsume(agg))
          .orElse(rollupSubsume(agg)).getOrElse(agg)
    }

  /** The attribute-only pruning Projects above a plan's core —
    * stripping them is semantics-free (pure column pruning), which is
    * what lets the subsumption probes compare plans that column
    * pruning rewrote differently. */
  private def core(p: LogicalPlan): LogicalPlan = p match {
    case Project(list, ch) if list.forall(_.isInstanceOf[Attribute]) => core(ch)
    case other => other
  }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => c
    case x => x
  }

  /** Substitution with the original subtree's output ids preserved —
    * fresh relation instance per use site (self-joins of one MV must
    * not share attribute ids), positional aliases on top. */
  private def substitute(agg: Aggregate, e: MvCatalog.Entry,
      wrap: LogicalPlan => LogicalPlan = identity): LogicalPlan = {
    val fresh = e.relation.newInstance()
    val aliases: Seq[NamedExpression] =
      agg.output.zip(fresh.output).map { case (orig, attr) =>
        Alias(attr, orig.name)(exprId = orig.exprId)
      }
    Project(aliases, wrap(fresh))
  }

  private def exactMatch(agg: Aggregate): Option[LogicalPlan] =
    MvCatalog.lookup(agg.canonicalized).collect {
      case e if e.relation.output.size == agg.output.size => substitute(agg, e)
    }

  /** FILTER SUBSUMPTION: a query that is the registered definition
    * plus one deterministic filter on grouping columns — i.e. it asks
    * for a SUBSET of the MV's groups. Predicate pushdown sinks such a
    * filter below the aggregate (often under intervening Projects), so
    * the probe strips the single Filter out of the child chain,
    * re-checks exact canonical equality of what remains, and — only
    * when every predicate reference maps onto a grouping column that
    * the MV materializes — re-applies the predicate ABOVE the MV scan.
    *
    * Grouping-compatibility guard, and why it is sound: all rows of a
    * group share their grouping values, so filtering rows on grouping
    * columns before aggregating selects exactly the groups whose
    * (materialized) grouping values satisfy the predicate, and leaves
    * every surviving group's aggregates untouched. A predicate that
    * touches any non-grouping column changes the rows INSIDE groups —
    * the map has no entry for it and the rewrite declines. Global
    * (ungrouped) aggregates also decline: aggregate-of-empty is one
    * row, filter-over-MV would be zero. Still no containment reasoning
    * beyond this — the rule can only answer with a wrong plan never,
    * a missed opportunity sometimes.
    *
    * Scale: this is the dashboard slice — `WHERE region = 'EU'` over a
    * registered per-region rollup reads O(matching groups) from the
    * materialization instead of rescanning the 100 TB fact table.
    * Composes with projection subsumption: a query that filters AND
    * takes a column subset matches through the same positional
    * matcher, so the served scan reads only the touched columns of
    * the matching groups. */
  private def filterSubsume(agg: Aggregate): Option[LogicalPlan] = {
    if (agg.groupingExpressions.isEmpty) return None
    stripOneFilter(agg.child).flatMap { case (stripped, pred) =>
      if (pred.references.isEmpty) return None
      val candidate = agg.copy(child = stripped)
      // exact arity first (cheap canonical lookup), else the positional
      // matcher — so a query that both FILTERS and takes a column
      // SUBSET of the MV still lands
      val matched: Option[(MvCatalog.Entry, Seq[Int])] =
        MvCatalog.lookup(candidate.canonicalized)
          .filter(_.relation.output.size == agg.output.size)
          .map(e => e -> agg.output.indices.toSeq)
          .orElse(matchAggregate(candidate))
      matched.flatMap { case (e, positions) =>
        // base-attr exprId → MV output position, via the grouping
        // columns that survive into the aggregate's output
        val grouping = agg.groupingExpressions
        def isGroupCol(a: Attribute): Boolean = grouping.exists(_.semanticEquals(a))
        val posOf: Map[ExprId, Int] =
          agg.aggregateExpressions.zipWithIndex.flatMap {
            case (a: Attribute, i) if isGroupCol(a)           => Seq(a.exprId -> positions(i))
            case (Alias(a: Attribute, _), i) if isGroupCol(a) => Seq(a.exprId -> positions(i))
            case _ => Nil
          }.toMap
        if (pred.references.forall(r => posOf.contains(r.exprId)))
          Some(substitutePositions(agg, e, positions, fresh => Filter(pred.transform {
            case a: Attribute if posOf.contains(a.exprId) =>
              fresh.output(posOf(a.exprId))
          }, fresh)))
        else None
      }
    }
  }

  /** Positional variant of [[substitute]]: query output column i reads
    * MV column `positions(i)`. */
  private def substitutePositions(agg: Aggregate, e: MvCatalog.Entry,
      positions: Seq[Int], wrap: LogicalPlan => LogicalPlan): LogicalPlan = {
    val fresh = e.relation.newInstance()
    val inner = wrap(fresh)
    // re-resolve against the wrapped plan's output: Filter preserves
    // attributes, so fresh.output indices stay valid
    Project(
      agg.output.zip(positions).map { case (orig, i) =>
        Alias(fresh.output(i), orig.name)(exprId = orig.exprId)
      },
      inner)
  }

  /** The single Filter in a chain of Projects under the aggregate
    * (where pushdown parks it); None if there is no filter or more
    * than the shapes this probe understands. */
  private def stripOneFilter(plan: LogicalPlan): Option[(LogicalPlan, Expression)] =
    plan match {
      case f: Filter if f.condition.deterministic => Some((f.child, f.condition))
      case p: Project =>
        stripOneFilter(p.child).map { case (ch, c) => (p.copy(child = ch), c) }
      case _ => None
    }

  /** PROJECTION SUBSUMPTION: a query whose aggregate asks for a SUBSET
    * (in any order) of a registered definition's columns — same
    * grouping, same aggregated input. Exact matching can't see this
    * because column pruning rewrites BOTH the aggregate list and the
    * child's projection, so the probe compares the plans UNDER their
    * attribute-only Project chains (pure pruning — stripping them is
    * semantics-free), transplants the definition's aggregate
    * expressions into the query's attribute space via the cores'
    * positional correspondence (canonical equality fixes the output
    * order), and requires every query column to canonically equal one
    * definition column modulo its alias. The rewrite then reads just
    * those columns of the materialization — column pruning reaches the
    * MV parquet scan, so a 2-column dashboard slice of a 40-column MV
    * reads 2 columns of O(groups), not the fact table.
    *
    * Anything the mapping can't prove — a grouping mismatch, an
    * aggregate the MV didn't materialize, a computed (non-attribute)
    * projection in between — declines to the base table. */
  private def projectionSubsume(agg: Aggregate): Option[LogicalPlan] =
    matchAggregate(agg).map { case (e, positions) =>
      substitutePositions(agg, e, positions, identity)
    }

  /** The positional matcher both subsumption probes share: finds an
    * entry whose definition has the same grouping and the same
    * aggregated input as `agg` (compared under the attribute-only
    * pruning Projects), and maps every query output column onto the
    * definition column it canonically equals (modulo alias) — the
    * definition's aggregate expressions are transplanted into the
    * query's attribute space via the cores' positional
    * correspondence, which canonical equality fixes. None if any
    * query column, grouping, or reference fails to map. */
  private def matchAggregate(agg: Aggregate): Option[(MvCatalog.Entry, Seq[Int])] = {
    val coreQ = core(agg.child)
    MvCatalog.allEntries.iterator.flatMap { e =>
      e.defAgg match {
        case Some(d) if e.relation.output.size == d.aggregateExpressions.size &&
            core(d.child).canonicalized == coreQ.canonicalized =>
          val coreD = core(d.child)
          val toQ: Map[ExprId, Attribute] =
            coreD.output.zip(coreQ.output).map { case (a, b) => a.exprId -> b }.toMap
          def transplanted(ex: Expression): Option[Expression] =
            if (ex.references.forall(r => toQ.contains(r.exprId)))
              Some(ex.transform { case a: Attribute if toQ.contains(a.exprId) => toQ(a.exprId) })
            else None
          val defGroups = d.groupingExpressions.flatMap(transplanted)
          val sameGrouping = defGroups.size == d.groupingExpressions.size &&
            defGroups.map(_.canonicalized).toSet ==
              agg.groupingExpressions.map(_.canonicalized).toSet
          if (!sameGrouping) None
          else {
            val defCols: Seq[Option[Expression]] =
              d.aggregateExpressions.map(x => transplanted(stripAlias(x)))
            val positions = agg.aggregateExpressions.map { q =>
              val key = stripAlias(q).canonicalized
              defCols.indexWhere(_.exists(_.canonicalized == key))
            }
            if (positions.forall(_ >= 0)) Some(e -> positions) else None
          }
        case _ => None
      }
    }.nextOption()
  }

  /** ROLL-UP SUBSUMPTION: a query grouping by a SUBSET of a registered
    * definition's keys (including the global aggregate) is answered by
    * RE-AGGREGATING the materialization — the MV's groups are a finer
    * partition of the query's, so sum/count fold by summing and
    * min/max by min/max, exactly the self-maintainable class
    * [[MvMaintenance]] merges by (count re-aggregates as SUM of the
    * stored counts). The per-nation dashboard over a per-(nation, day)
    * rollup aggregates O(MV groups) instead of rescanning the fact
    * table.
    *
    * Sound-or-decline: every query aggregate must CANONICALLY EQUAL a
    * materialized definition column (so inputs, FILTER clauses and
    * everything else agree) AND be a non-DISTINCT sum/count/min/max —
    * avg-of-avgs and distinct-of-distincts are exactly the folds this
    * must never do; every query grouping expression must be visible as
    * an MV column to group the re-aggregation by. The result keeps the
    * query's output ids (cast back to the original types — a re-sum
    * widens decimals), so parents resolve unchanged. */
  /** Inline a chain of Projects down to its base plan: the base plus a
    * substitution from every projected alias's exprId to its FULLY
    * INLINED expression over the base's attributes. This sees through
    * both pure pruning Projects and the computed Projects the analyzer
    * introduces for complex grouping expressions
    * (PullOutGroupingExpressions' `_groupingexpression` aliases). */
  private def inlineProjects(p: LogicalPlan): (LogicalPlan, Map[ExprId, Expression]) =
    p match {
      case Project(list, ch) =>
        val (base, sub) = inlineProjects(ch)
        val entries = list.map {
          case a: Attribute => a.exprId -> sub.getOrElse(a.exprId, a)
          case al @ Alias(c, _) =>
            al.exprId -> c.transformUp {
              case at: Attribute => sub.getOrElse(at.exprId, at)
            }
        }
        (base, sub ++ entries)
      case other => (other, Map.empty)
    }

  private def rollupSubsume(agg: Aggregate): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
    val (baseQ, subQ) = inlineProjects(agg.child)
    def inQ(ex: Expression): Expression = ex.transformUp {
      case a: Attribute => subQ.getOrElse(a.exprId, a)
    }
    MvCatalog.allEntries.iterator.flatMap { e =>
      e.defAgg match {
        case Some(d) if e.relation.output.size == d.aggregateExpressions.size =>
          val (baseD, subD) = inlineProjects(d.child)
          if (baseD.canonicalized != baseQ.canonicalized) None
          else {
            // def expressions → base-D attrs (inline the pulled-out
            // aliases) → base-Q attrs (positional, fixed by canonical
            // base equality)
            val toQ: Map[ExprId, Attribute] =
              baseD.output.zip(baseQ.output).map { case (a, b) => a.exprId -> b }.toMap
            def inD(ex: Expression): Option[Expression] = {
              val inl = ex.transformUp {
                case a: Attribute => subD.getOrElse(a.exprId, a)
              }
              if (inl.references.forall(r => toQ.contains(r.exprId)))
                Some(inl.transformUp {
                  case a: Attribute if toQ.contains(a.exprId) => toQ(a.exprId)
                })
              else None
            }
            val defGroups = d.groupingExpressions.flatMap(inD)
            val defCols: Seq[Option[Expression]] =
              d.aggregateExpressions.map(x => inD(stripAlias(x)))
            def posOf(ex: Expression): Int =
              defCols.indexWhere(_.exists(_.canonicalized == ex.canonicalized))
            val queryGroups = agg.groupingExpressions.map(inQ)
            // the query's keys must be a PROPER subset of the
            // definition's (the equal case belongs to the exact and
            // projection probes), each readable as an MV column
            val defGroupSet = defGroups.map(_.canonicalized).toSet
            val querySubset =
              defGroups.size == d.groupingExpressions.size &&
              queryGroups.forall(g => defGroupSet.contains(g.canonicalized)) &&
              queryGroups.size < d.groupingExpressions.size
            val groupPos = queryGroups.map(posOf)
            if (!querySubset || groupPos.exists(_ < 0)) None
            else {
              def isGroupExpr(ex: Expression): Boolean =
                queryGroups.exists(_.semanticEquals(ex))
              // an Average in the query cannot fold from the SERVING
              // columns (avg-of-avgs) — but when the maintenance tier
              // registered the MV's decomposed `_state` (sum+count
              // pieces per avg), the fold reads the STATE relation
              // instead: every column of the serving MV exists there
              // by name, and each avg re-derives as Σsum/Σcnt — the
              // cube-lattice payoff extended to the non-mergeable
              // aggregate via its decomposition
              val needsAvg = agg.aggregateExpressions.exists { q =>
                inQ(stripAlias(q)) match {
                  case ae: AggregateExpression =>
                    ae.aggregateFunction.isInstanceOf[Average]
                  case _ => false
                }
              }
              // (plan source, MV-position → source attr, definition
              // column name → its (sum, count) piece attrs)
              val sourceOpt: Option[(LogicalPlan, Int => Option[Attribute],
                  String => Option[(Attribute, Attribute)])] =
                if (!needsAvg) {
                  val f = e.relation.newInstance()
                  Some((f, (p: Int) => f.output.lift(p), (_: String) => None))
                } else e.avgState.map { case (stRel, pieces) =>
                  val f = stRel.newInstance()
                  val byName = f.output.map(a => a.name -> a).toMap
                  ((f: LogicalPlan),
                    (p: Int) => d.aggregateExpressions.lift(p)
                      .flatMap(ne => byName.get(ne.name)),
                    (n: String) => pieces.get(n).flatMap { case (s, c) =>
                      for { a <- byName.get(s); b <- byName.get(c) } yield (a, b)
                    })
                }
              sourceOpt.flatMap { case (fresh, colAt, pieceFor) =>
                def typed(ex: Expression, dt: org.apache.spark.sql.types.DataType): Expression =
                  if (ex.dataType == dt) ex else Cast(ex, dt)
                // every output column: a visible key, or a re-aggregable
                // aggregate canonically equal to a materialized column
                val outs: Seq[Option[NamedExpression]] =
                  agg.aggregateExpressions.map { q =>
                    val stripped = inQ(stripAlias(q))
                    if (isGroupExpr(stripped)) {
                      val p = posOf(stripped)
                      if (p >= 0) colAt(p).map(a => Alias(a, q.name)(exprId = q.exprId))
                      else None
                    } else stripped match {
                      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
                        val p = posOf(stripped)
                        if (p < 0) None
                        else ae.aggregateFunction match {
                          case _: Sum => colAt(p).map { a =>
                            Alias(typed(AggregateExpression(Sum(a), Complete,
                              isDistinct = false), q.dataType), q.name)(exprId = q.exprId)
                          }
                          // COUNT folds as Sum of the stored counts, but
                          // Sum over ZERO rows is NULL where COUNT is 0 —
                          // reachable when a GLOBAL rollup reads an empty
                          // materialization — so the fold coalesces to 0
                          case _: Count => colAt(p).map { a =>
                            Alias(typed(Coalesce(Seq(
                              AggregateExpression(Sum(a), Complete, isDistinct = false),
                              Literal(0L))), q.dataType), q.name)(exprId = q.exprId)
                          }
                          case _: Min => colAt(p).map { a =>
                            Alias(typed(AggregateExpression(Min(a), Complete,
                              isDistinct = false), q.dataType), q.name)(exprId = q.exprId)
                          }
                          case _: Max => colAt(p).map { a =>
                            Alias(typed(AggregateExpression(Max(a), Complete,
                              isDistinct = false), q.dataType), q.name)(exprId = q.exprId)
                          }
                          case _: Average =>
                            d.aggregateExpressions.lift(p).map(_.name)
                              .flatMap(pieceFor).map { case (sA, cA) =>
                                import org.apache.spark.sql.catalyst.expressions.{Divide, EqualTo, If}
                                import org.apache.spark.sql.types.DoubleType
                                val sumS = AggregateExpression(Sum(sA), Complete,
                                  isDistinct = false)
                                val sumC = AggregateExpression(Sum(cA), Complete,
                                  isDistinct = false)
                                // zero-count groups divide by NULL, not 0:
                                // Average of no inputs is NULL, and ANSI
                                // sessions must not throw on the fold
                                val quot = Divide(
                                  Cast(sumS, DoubleType),
                                  If(EqualTo(sumC, Literal(0L)),
                                    Literal(null, DoubleType), Cast(sumC, DoubleType)))
                                Alias(typed(quot, q.dataType), q.name)(exprId = q.exprId)
                              }
                          case _ => None
                        }
                      case _ => None
                    }
                  }
                val groupAttrs = groupPos.map(colAt)
                if (outs.forall(_.isDefined) && groupAttrs.forall(_.isDefined))
                  Some(Aggregate(groupAttrs.map(_.get), outs.map(_.get), fresh))
                else None
              }
            }
          }
        case _ => None
      }
    }.nextOption()
  }
}
