package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CdcQueries => CdcQ, DedupQueries => DedupQ, Events => EventsQ, GraphQueries => GraphQ, KbQueries => KbQ, LakehouseQueries => LakeQ, MaintenanceQueries => MaintQ, MultimodalQueries => MmQ, ProfileQueries => ProfileQ, QualityQueries => QualityQ, Relational => RelationalQ, SimilarityQueries => SimQ, SubqueryQueries => SubQ, SearchQueries => SearchQ, TextQueries => TextQ, TpchQueries => TpchQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears as one entry in
  * [[queries]]; where the semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle is in [[oracleSql]] (same column names — the driver
  * sorts columns by name before hashing values).
  */
object SparkEntry {

  /** The full declared inventory. */
  def defs: Seq[QueryDef] =
    RelationalQ.all ++ EventsQ.all ++ TextQ.all ++ DedupQ.all ++ SimQ.all ++
      CdcQ.all ++ KbQ.all ++ MmQ.all ++ SubQ.all ++ TpchQ.all ++ SearchQ.all ++
      QualityQ.all ++ MaintQ.all ++ GraphQ.all ++ ProfileQ.all ++ LakeQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQ.q1PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
