package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
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
  * differences are normalized away, while anything semantically
  * different (another grouping column, an extra filter, a different
  * aggregate) simply fails to match and runs against the base table.
  * Exact-match-only is deliberately conservative: no containment
  * reasoning (filter-subsumption rewrites), so the rule can never
  * produce a wrong answer, only miss an opportunity.
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
      mvPath: String)

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
      path: String): Unit = {
    val read = spark.read.parquet(path)
    val defTypes = defDf.schema.map(f => (f.name, f.dataType))
    val gotTypes = read.schema.map(f => (f.name, f.dataType))
    require(gotTypes == defTypes,
      s"materialization at $path reads back as $gotTypes, definition is $defTypes")
    val rel = read.queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation => lr
    }.getOrElse(throw new IllegalStateException(
      s"parquet read of $path did not produce a LogicalRelation"))
    entries.put(name,
      Entry(name, defDf.queryExecution.optimizedPlan.canonicalized, rel, path))
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
}

object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.isEmpty) plan
    else plan.transformUp {
      // MV definitions are aggregates; restricting the probe to
      // Aggregate nodes keeps the non-MV planning cost at zero
      case agg: Aggregate =>
        MvCatalog.lookup(agg.canonicalized) match {
          case Some(e) if e.relation.output.size == agg.output.size =>
            // fresh instance per use site — self-joins of one MV must
            // not share attribute ids
            val fresh = e.relation.newInstance()
            val aliases: Seq[NamedExpression] =
              agg.output.zip(fresh.output).map { case (orig, attr) =>
                Alias(attr, orig.name)(exprId = orig.exprId)
              }
            Project(aliases, fresh)
          case _ => agg
        }
    }
}
