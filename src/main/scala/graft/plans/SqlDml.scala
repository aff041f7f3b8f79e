package graft.plans

import graft.sources.{TimeTravel, TimeTravelTable}

import org.apache.spark.sql.{AnalysisException, GraftPlanApi, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, OverwriteByExpression, Project, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** SQL DML faces for the versioned table — the injected resolution
  * rule that makes `MERGE INTO` / `DELETE FROM` / `UPDATE` statements
  * over a [[graft.sources.GraftCatalog]] identifier (or any resolved
  * `graft-table` relation) execute through the library's row-level
  * operations instead of failing Spark's supports-row-level-ops check:
  *
  *   - `DELETE FROM graft.`/p` WHERE c` → [[TimeTravel.deleteMoR]]
  *     (tombstones only, data files untouched);
  *   - `UPDATE graft.`/p` SET a = e WHERE c` → [[TimeTravel.updateMoR]]
  *     (tombstone + updated copies, one atomic publish);
  *   - `MERGE INTO graft.`/p` t USING s ON t.k = s.k
  *        WHEN MATCHED THEN UPDATE SET … WHEN NOT MATCHED THEN INSERT …`
  *     → [[TimeTravel.merge]] (the upsert commit), provided the update
  *     and insert assignments agree column-for-column — the canonical
  *     upsert. Shapes the library cannot express exactly (extra WHEN
  *     clauses, divergent update/insert rows, multi-column or
  *     non-equality ON) fail LOUDLY at analysis with the supported
  *     form in the message — never a silently different row set.
  *
  * This is the Delta-style command translation (their DeltaAnalysis
  * turns the same three logical nodes into runnable commands): the
  * rule fires during analysis, after the node's children and
  * expressions resolve, and replaces it with a driver command whose
  * `run` calls the library op — so the optimizer's
  * RewriteDeleteFromTable/RewriteMergeIntoTable (which require
  * SupportsRowLevelOperations) never see the node. Parsed predicates
  * and SET expressions re-bind BY NAME against the fresh snapshot the
  * library op reads: the command re-reads latest at execution, exactly
  * like any DML engine between analysis and commit.
  *
  * Each statement returns the committed version as a one-row result —
  * the SQL-visible receipt that also makes `VERSION AS OF` follow-ups
  * deterministic in scripts.
  */
object SqlDml extends Rule[LogicalPlan] {

  /** The target table under optional aliases, with its path. */
  private object GraftTarget {
    def unapply(p: LogicalPlan): Option[TimeTravelTable] = p match {
      case DataSourceV2Relation(t: TimeTravelTable, _, _, _, _, _) => Some(t)
      case SubqueryAlias(_, child) => unapply(child)
      case _ => None
    }
  }

  /** Opaque box around an already-resolved expression: the command's
    * predicates/assignments must NOT surface through `expressions`,
    * or CheckAnalysis rejects IN/EXISTS subqueries it only allows
    * under the nodes it knows (`DELETE FROM … WHERE k IN (SELECT …)`
    * is legal SQL and the run-time filter context accepts it — the
    * box just carries it past the structural check, exactly as
    * command-translation layers over Spark have always had to). */
  final case class Boxed(expr: Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case d @ DeleteFromTable(GraftTarget(t), cond) if d.resolved =>
      GraftDeleteCommand(t.tablePath, Boxed(cond))

    case u @ UpdateTable(GraftTarget(t), assignments, cond) if u.resolved =>
      GraftUpdateCommand(t.tablePath,
        assignments.map(a => targetColName(a.key, "UPDATE SET") -> Boxed(a.value)),
        cond.map(Boxed))

    case m: MergeIntoTable if m.resolved &&
        GraftTarget.unapply(m.targetTable).isDefined =>
      translateMerge(m, GraftTarget.unapply(m.targetTable).get)

    // INSERT INTO → commitAppend; guard on the WRITE NODE's resolved
    // (which includes outputResolved — the analyzer has aligned and
    // cast the query to the table schema), not just query.resolved,
    // so translation never wins the race against output resolution
    // and commits misaligned rows
    case a @ AppendData(r, query, _, _, _, _) if a.resolved &&
        GraftTarget.unapply(r.asInstanceOf[LogicalPlan]).isDefined =>
      GraftInsertCommand(GraftTarget.unapply(r.asInstanceOf[LogicalPlan]).get.tablePath,
        query, overwrite = false)

    // INSERT OVERWRITE → commitOverwrite (full-table) or the scoped
    // replaceWhere form (partition-predicate overwrite = delete(pred)
    // + append in ONE commit); history stays time-travelable either way
    case o @ OverwriteByExpression(r, deleteExpr, query, _, _, _, _)
        if o.resolved &&
          GraftTarget.unapply(r.asInstanceOf[LogicalPlan]).isDefined =>
      val path = GraftTarget.unapply(r.asInstanceOf[LogicalPlan]).get.tablePath
      deleteExpr match {
        case org.apache.spark.sql.catalyst.expressions.Literal(true, _) =>
          GraftInsertCommand(path, query, overwrite = true)
        case pred =>
          GraftReplaceWhereCommand(path, Boxed(pred), query)
      }
  }

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100", // generic internal-message class
      messageParameters = Map("message" -> msg))

  private def targetColName(key: Expression, what: String): String = key match {
    case a: AttributeReference => a.name
    case other => fail(s"graft $what supports only top-level target columns, got: $other")
  }

  /** The canonical-upsert check and translation (sound-or-decline —
    * decline here is a LOUD analysis error, since unlike an optimizer
    * rewrite there is no slower correct fallback for DML). */
  private def translateMerge(m: MergeIntoTable, t: TimeTravelTable): LogicalPlan = {
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("graft MERGE does not support WHEN NOT MATCHED BY SOURCE clauses")
    val targetOut = m.targetTable.output
    val sourceOut = m.sourceTable.outputSet
    // ON t.k = s.k — exactly one equality between a target and a
    // source attribute (either operand order); keep the SOURCE-side
    // attribute too, so the key column's assignment can be checked
    // against it below
    val (key, keySrcAttr) = m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (targetOut.exists(_.exprId == a.exprId) && sourceOut.contains(b)) (a.name, b)
        else if (targetOut.exists(_.exprId == b.exprId) && sourceOut.contains(a)) (b.name, a)
        else fail("graft MERGE requires ON <target col> = <source col>")
      case other =>
        fail(s"graft MERGE supports only a single-key equality ON clause, got: ${other.sql}")
    }
    val updAssigns: Seq[Assignment] = m.matchedActions match {
      case Seq(UpdateAction(cond, as, _)) =>
        if (cond.nonEmpty) fail("graft MERGE does not support a conditional WHEN MATCHED")
        as
      case Seq() => fail("graft MERGE requires WHEN MATCHED THEN UPDATE")
      case Seq(DeleteAction(_)) =>
        fail("graft MERGE does not support WHEN MATCHED THEN DELETE; " +
          "use DELETE FROM with an IN/EXISTS predicate")
      case _ => fail("graft MERGE supports exactly one WHEN MATCHED THEN UPDATE action")
    }
    val insAssigns: Seq[Assignment] = m.notMatchedActions match {
      case Seq(InsertAction(None, as)) => as
      case Seq(InsertAction(Some(_), _)) =>
        fail("graft MERGE does not support a conditional WHEN NOT MATCHED")
      case _ => fail("graft MERGE requires exactly WHEN NOT MATCHED THEN INSERT")
    }
    // matched rows are REPLACED by the projected source row, so the
    // update and insert assignments must agree on every target column
    // — the canonical upsert (UPDATE SET * / INSERT *, or identical
    // explicit lists)
    def byCol(as: Seq[Assignment], what: String): Map[String, Expression] = {
      val pairs = as.map(a => targetColName(a.key, what) -> a.value)
      val dup = pairs.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
      if (dup.nonEmpty) fail(s"graft MERGE $what assigns ${dup.mkString(", ")} twice")
      pairs.toMap
    }
    val upd = byCol(updAssigns, "UPDATE SET")
    val ins = byCol(insAssigns, "INSERT")
    val missing = targetOut.map(_.name).filterNot(n => upd.contains(n) && ins.contains(n))
    if (missing.nonEmpty)
      fail(s"graft MERGE must assign every target column in both UPDATE and INSERT " +
        s"(replaced rows take the whole source row); missing: ${missing.mkString(", ")}")
    targetOut.foreach { a =>
      if (upd(a.name).canonicalized != ins(a.name).canonicalized)
        fail(s"graft MERGE UPDATE and INSERT disagree on column ${a.name}; " +
          "the library merge replaces matched rows with the same projected source row")
    }
    // TimeTravel.merge keys the upsert on the PROJECTED column named
    // after `key` — whose value is the assignment, not the ON clause.
    // Sound only when the assignment IS the ON equality's source-side
    // attribute (modulo an implicit cast the analyzer may have added);
    // `SET k = s.j` would silently match on s.j, so fail loudly.
    def stripCast(e: Expression): Expression = e match {
      case org.apache.spark.sql.catalyst.expressions.Cast(c, _, _, _) => stripCast(c)
      case other => other
    }
    if (!stripCast(upd(key)).semanticEquals(keySrcAttr))
      fail(s"graft MERGE requires the key column $key to be assigned the ON " +
        s"clause's source attribute ${keySrcAttr.name} in both UPDATE and INSERT " +
        s"(got: ${upd(key).sql}); the library merge matches on the projected key value")
    // project the source into target-row shape ONCE; TimeTravel.merge
    // keys the upsert on `key`, which the projection carries by name
    val aliases: Seq[NamedExpression] = targetOut.map { a =>
      Alias(upd(a.name), a.name)()
    }
    GraftMergeCommand(t.tablePath, Project(aliases, m.sourceTable), key)
  }

  /** Re-bind a parsed expression by NAME for the library op's fresh
    * snapshot read (exprIds from the analyzed statement don't exist in
    * the new plan). */
  private[plans] def byName(e: Expression): org.apache.spark.sql.Column =
    GraftPlanApi.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

/** `DELETE FROM` a versioned table → merge-on-read tombstones. */
final case class GraftDeleteCommand(path: String, cond: SqlDml.Boxed)
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TimeTravel.deleteMoR(spark, path, SqlDml.byName(cond.expr))))
}

/** `UPDATE` a versioned table → tombstone + updated copies. */
final case class GraftUpdateCommand(path: String,
    sets: Seq[(String, SqlDml.Boxed)], cond: Option[SqlDml.Boxed])
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val where = cond.map(b => SqlDml.byName(b.expr))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    Seq(Row(TimeTravel.updateMoR(spark, path,
      where, sets.map { case (n, b) => n -> SqlDml.byName(b.expr) })))
  }
}

/** `INSERT INTO` / `INSERT OVERWRITE` a versioned table → an append
  * or overwrite COMMIT — the statement's rows become one new version,
  * and (for overwrite) earlier snapshots stay readable, unlike a file
  * overwrite. The query plan rides inside the command, already
  * schema-aligned by the analyzer's output resolution. */
final case class GraftInsertCommand(path: String, query: LogicalPlan,
    overwrite: Boolean) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftPlanApi.ofRows(spark, query)
    val v =
      if (overwrite) TimeTravel.commitOverwrite(df, path)
      else TimeTravel.commitAppend(df, path)
    Seq(Row(v))
  }
}

/** Scoped `INSERT OVERWRITE … WHERE`-equivalent (the analyzer lowers
  * `INSERT OVERWRITE t PARTITION`-style and static-predicate overwrites
  * to OverwriteByExpression with a non-true condition) →
  * [[TimeTravel.replaceWhere]]: delete(pred) + append in ONE commit,
  * untouched files byte-identical. */
final case class GraftReplaceWhereCommand(path: String, cond: SqlDml.Boxed,
    query: LogicalPlan) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TimeTravel.replaceWhere(spark, path,
      SqlDml.byName(cond.expr), GraftPlanApi.ofRows(spark, query))))
}

/** Canonical-upsert `MERGE INTO` → [[TimeTravel.merge]]. The projected
  * source plan rides inside the command and is executed at run time —
  * its own relations were resolved by the analyzer with the statement.
  *
  * SQL/Delta MERGE semantics require an ERROR when one target row
  * matches multiple source rows (and a non-unique USING source would
  * also silently insert its duplicates), so the run detects duplicate
  * source keys up front and fails before committing anything. The
  * check is one aggregation over the (cached) source — the price of
  * the loud-or-exact contract. */
final case class GraftMergeCommand(path: String, projectedSource: LogicalPlan,
    key: String) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Seq(projectedSource)
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val src = GraftPlanApi.ofRows(spark, projectedSource)
    src.cache()
    try {
      val dups = src.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(5).collect()
      if (dups.nonEmpty)
        throw new AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            (s"graft MERGE source has duplicate keys in $key (a target row would " +
              s"match multiple source rows): ${dups.map(_.get(0)).mkString(", ")}")))
      Seq(Row(TimeTravel.merge(spark, path, src, key)))
    } finally src.unpersist()
  }
}
