package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-addressed catalog face of the versioned table — the piece
  * that lets plain SQL name a [[TimeTravel]] table at all:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  * SELECT * FROM graft.`/data/events`                  -- latest snapshot
  * SELECT * FROM graft.`/data/events` VERSION AS OF 3  -- time travel
  * DELETE FROM graft.`/data/events` WHERE …            -- via SqlDml
  * MERGE INTO graft.`/data/events` t USING src s ON …  -- via SqlDml
  * }}}
  *
  * The identifier IS the table path (the `delta.`/path`` idiom): no
  * metastore, no DDL lifecycle — the manifest directory under the path
  * is the table's existence. `loadTable` hands back the same
  * [[TimeTravelTable]] the `graft-table` DataSource V2 face builds, so
  * every injected rule over that relation ([[graft.plans.DvApply]],
  * [[graft.plans.StatsPrune]], the [[graft.plans.SqlDml]] command
  * translation) fires identically whether the scan came from
  * `spark.read.format("graft-table")` or from a SQL identifier.
  *
  * Catalog mutations (CREATE/ALTER/DROP TABLE) are deliberately
  * unsupported: table lifecycle belongs to [[TimeTravel]] commits, and
  * a second DDL path would race the manifest's optimistic-concurrency
  * story. Reads-and-DML-only is the whole contract.
  */
class GraftCatalog extends CatalogPlugin with TableCatalog with ProcedureCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def tableOptions(path: String, version: Option[String]): CaseInsensitiveStringMap = {
    val m = new util.HashMap[String, String]()
    m.put("path", path)
    version.foreach(m.put("version", _))
    new CaseInsensitiveStringMap(m)
  }

  override def loadTable(ident: Identifier): Table =
    TimeTravelTable(tableOptions(pathOf(ident), None))

  /** `VERSION AS OF n` through the SQL surface — same pinned-snapshot
    * semantics as the DSv2 `version` option. */
  override def loadTable(ident: Identifier, version: String): Table =
    TimeTravelTable(tableOptions(pathOf(ident), Some(version)))

  /** `TIMESTAMP AS OF t` — Spark hands the instant as epoch MICROS;
    * the snapshot is the newest version whose manifest was published
    * at or before it ([[TimeTravel.versionAsOf]]), then pinned exactly
    * like a version read. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    val v = TimeTravel.versionAsOf(
      org.apache.spark.sql.SparkSession.active, path, timestamp / 1000L)
    TimeTravelTable(tableOptions(path, Some(v.toString)))
  }

  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true }
    catch { case scala.util.control.NonFatal(_) => false }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no enumerable namespace

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is path-addressed: create tables with TimeTravel.commitOverwrite")

  /** Schema evolution v2 through SQL DDL (r10): RENAME/DROP COLUMN and
    * lossless type widening translate to the library's metadata-only
    * mapping commits — one manifest rename each, zero data rewritten.
    * Everything else keeps the loud decline (table lifecycle belongs
    * to commits). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val spark = org.apache.spark.sql.SparkSession.active
    val path = pathOf(ident)
    changes.foreach {
      case r: TableChange.RenameColumn if r.fieldNames.length == 1 =>
        TimeTravel.renameColumn(spark, path, r.fieldNames.head, r.newName): Unit
      case d: TableChange.DeleteColumn if d.fieldNames.length == 1 =>
        TimeTravel.dropColumn(spark, path, d.fieldNames.head): Unit
      case u: TableChange.UpdateColumnType if u.fieldNames.length == 1 =>
        TimeTravel.widenColumn(spark, path, u.fieldNames.head,
          u.newDataType.catalogString): Unit
      case other => throw new UnsupportedOperationException(
        s"graft ALTER TABLE supports RENAME COLUMN / DROP COLUMN / lossless " +
          s"ALTER COLUMN TYPE only, got: $other; evolve anything else via commits")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog does not support DROP TABLE; use TimeTravel.vacuum/purge")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog is path-addressed: rename the directory, not the table")

  // ------------------------------------------- SQL CALL procedures (r10)
  //
  // The maintenance trio as Spark 4 stored procedures — the SQL face a
  // warehouse operator expects for table upkeep:
  //
  //   CALL graft.optimize('/path', 4)      -- compact to ≤4 files
  //   CALL graft.vacuum('/path', 1)        -- drop unreferenced dirs
  //   CALL graft.rollback('/path', 3)      -- re-publish v3 as a new version
  //
  // Each returns its evidence as result rows (version committed /
  // directories dropped) via a LocalScan — the values are driver-side
  // receipts, never data.

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.Names.map(n => Identifier.of(namespace, n)).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(ident.name())
}

/** The catalog's stored procedures — thin SQL shims over the library's
  * maintenance ops; the logic stays in [[TimeTravel]]. */
private[sources] object GraftProcedures {

  val Names: Seq[String] = Seq("optimize", "vacuum", "rollback", "collect_stats",
    "export_delta", "export_iceberg", "export_iceberg_v3",
    "export_delta_append", "export_iceberg_append",
    "delta_history", "delta_checkpoint", "delta_cleanup_log", "delta_vacuum",
    "iceberg_expire_snapshots", "iceberg_remove_orphans",
    "iceberg_cleanup_metadata", "create_branch", "create_tag", "drop_ref")

  def load(name: String): UnboundProcedure = name.toLowerCase match {
    case "optimize" => unbound("optimize",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("target_files", IntegerType).build()),
      new StructType().add("version", LongType, nullable = false),
      (spark, in) => {
        val v = TimeTravel.optimize(spark, in.getString(0), in.getInt(1))
        Array(InternalRow(v))
      })
    case "vacuum" => unbound("vacuum",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("keep_versions", IntegerType).build(),
        ProcedureParameter.in("dry_run", org.apache.spark.sql.types.BooleanType).build()),
      new StructType().add("dropped_dir", StringType, nullable = false),
      (spark, in) => {
        val path = in.getString(0); val keep = in.getInt(1)
        val dropped =
          if (in.getBoolean(2)) { // dry run: report, touch nothing
            val live = TimeTravel.versions(spark, path)
              .takeRight(keep.max(1))
            // a dry run must not delete; reuse vacuum's victim logic by
            // diffing the live set against the disk listing read-only
            TimeTravel.vacuumVictims(spark, path, live)
          } else TimeTravel.vacuum(spark, path, keep)
        dropped.map(d =>
          InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(d))).toArray
      })
    case "rollback" => unbound("rollback",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("to_version", LongType).build()),
      new StructType().add("version", LongType, nullable = false),
      (spark, in) => {
        val v = TimeTravel.rollback(spark, in.getString(0), in.getLong(1))
        Array(InternalRow(v))
      })
    case "collect_stats" => unbound("collect_stats",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("columns", StringType).build()),
      new StructType().add("covered_dir", StringType, nullable = false),
      (spark, in) => {
        val cols = in.getString(1).split(',').toSeq.map(_.trim).filter(_.nonEmpty)
        TimeTravel.collectStats(spark, in.getString(0), cols)
          .map(d => InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(d))).toArray
      })
    case "export_delta" => unbound("export_delta",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("target", StringType).build()),
      new StructType().add("n_files", IntegerType, nullable = false),
      (spark, in) => Array(InternalRow(
        DeltaExport.snapshot(spark, in.getString(0), in.getString(1)))))
    case "export_iceberg" => unbound("export_iceberg",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("target", StringType).build()),
      new StructType().add("n_files", IntegerType, nullable = false),
      (spark, in) => Array(InternalRow(
        IcebergExport.snapshot(spark, in.getString(0), in.getString(1)))))
    case "export_iceberg_v3" => unbound("export_iceberg_v3",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("target", StringType).build()),
      new StructType().add("n_files", IntegerType, nullable = false),
      (spark, in) => Array(InternalRow(
        IcebergExport.snapshot(spark, in.getString(0), in.getString(1),
          formatVersion = 3))))
    case "export_delta_append" => unbound("export_delta_append",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("target", StringType).build()),
      new StructType().add("n_files", IntegerType, nullable = false),
      (spark, in) => Array(InternalRow(
        DeltaExport.append(spark, in.getString(0), in.getString(1)))))
    case "export_iceberg_append" => unbound("export_iceberg_append",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("target", StringType).build()),
      new StructType().add("n_files", IntegerType, nullable = false),
      (spark, in) => Array(InternalRow(
        IcebergExport.append(spark, in.getString(0), in.getString(1)))))
    // ---- lakehouse maintenance (r13): the published tables' upkeep,
    // CALL-able like any warehouse procedure; logic in
    // [[DeltaMaintenance]]/[[IcebergMaintenance]]
    case "delta_history" => unbound("delta_history",
      Array(ProcedureParameter.in("path", StringType).build()),
      new StructType()
        .add("version", LongType, nullable = false)
        .add("operation", StringType)
        .add("n_adds", LongType, nullable = false)
        .add("n_removes", LongType, nullable = false)
        .add("n_dv_adds", LongType, nullable = false),
      (spark, in) => DeltaMaintenance.history(spark, in.getString(0))
        .select("version", "operation", "n_adds", "n_removes", "n_dv_adds")
        .collect().map(r => InternalRow( // bounded: one row per commit
          r.getLong(0),
          Option(r.getString(1))
            .map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
          r.getLong(2), r.getLong(3), r.getLong(4))))
    case "delta_checkpoint" => unbound("delta_checkpoint",
      Array(ProcedureParameter.in("path", StringType).build()),
      new StructType().add("version", LongType, nullable = false),
      (spark, in) => Array(InternalRow(
        DeltaMaintenance.checkpoint(spark, in.getString(0)))))
    case "delta_cleanup_log" => unbound("delta_cleanup_log",
      Array(ProcedureParameter.in("path", StringType).build()),
      new StructType().add("removed_version", LongType, nullable = false),
      (spark, in) => DeltaMaintenance.cleanupLog(spark, in.getString(0))
        .map(InternalRow(_)).toArray)
    case "delta_vacuum" => unbound("delta_vacuum",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("dry_run",
          org.apache.spark.sql.types.BooleanType).build()),
      new StructType().add("removed_file", StringType, nullable = false),
      (spark, in) => DeltaMaintenance.vacuum(spark, in.getString(0),
          dryRun = in.getBoolean(1))
        .map(n => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(n))).toArray)
    case "iceberg_expire_snapshots" => unbound("iceberg_expire_snapshots",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("retain_last", IntegerType).build(),
        ProcedureParameter.in("dry_run",
          org.apache.spark.sql.types.BooleanType).build()),
      new StructType()
        .add("expired_snapshots", IntegerType, nullable = false)
        .add("lists_removed", IntegerType, nullable = false)
        .add("manifests_removed", IntegerType, nullable = false)
        .add("orphan_files_removed", IntegerType, nullable = false),
      (spark, in) => {
        val r = IcebergMaintenance.expireSnapshots(spark, in.getString(0),
          retainLast = in.getInt(1), dryRun = in.getBoolean(2))
        Array(InternalRow(r.expiredSnapshotIds.size,
          r.manifestListsRemoved.size, r.manifestsRemoved.size,
          r.orphanFilesRemoved.size))
      })
    case "iceberg_remove_orphans" => unbound("iceberg_remove_orphans",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("dry_run",
          org.apache.spark.sql.types.BooleanType).build()),
      new StructType().add("removed_file", StringType, nullable = false),
      (spark, in) => IcebergMaintenance.removeOrphanFiles(spark,
          in.getString(0), dryRun = in.getBoolean(1))
        .map(n => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(n))).toArray)
    case "iceberg_cleanup_metadata" => unbound("iceberg_cleanup_metadata",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("keep_last", IntegerType).build()),
      new StructType().add("removed_file", StringType, nullable = false),
      (spark, in) => IcebergMaintenance.cleanupMetadata(spark,
          in.getString(0), keepLast = in.getInt(1))
        .map(n => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(n))).toArray)
    // ref CRUD (r15): the SQL face of branch/tag writes —
    //   CALL graft.create_branch('/iceberg/path', 'dev')
    //   CALL graft.create_tag('/iceberg/path', 'v1', 77)
    //   CALL graft.drop_ref('/iceberg/path', 'dev')
    case "create_branch" => unbound("create_branch",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("name", StringType).build()),
      new StructType().add("snapshot_id", LongType, nullable = false),
      (spark, in) => Array(InternalRow(IcebergExport.createRef(
        spark, in.getString(0), in.getString(1), "branch"))))
    case "create_tag" => unbound("create_tag",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("snapshot_id", LongType).build()),
      new StructType().add("snapshot_id", LongType, nullable = false),
      (spark, in) => Array(InternalRow(IcebergExport.createRef(
        spark, in.getString(0), in.getString(1), "tag",
        snapshotId = Some(in.getLong(2))))))
    case "drop_ref" => unbound("drop_ref",
      Array(ProcedureParameter.in("path", StringType).build(),
        ProcedureParameter.in("name", StringType).build()),
      new StructType().add("dropped", StringType, nullable = false),
      (spark, in) => {
        IcebergExport.dropRef(spark, in.getString(0), in.getString(1))
        Array(InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(in.getString(1))))
      })
    case other => throw new UnsupportedOperationException(
      s"graft catalog has no procedure '$other'; available: ${Names.mkString(", ")}")
  }

  private def unbound(procName: String, params: Array[ProcedureParameter],
      resultSchema: StructType,
      body: (org.apache.spark.sql.SparkSession, InternalRow) => Array[InternalRow])
      : UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft table maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft table maintenance: $procName"
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false // commits mutate state
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val spark = org.apache.spark.sql.SparkSession.active
          val out = body(spark, input)
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = out
            override def readSchema(): StructType = resultSchema
          }).iterator()
        }
      }
    }
}
