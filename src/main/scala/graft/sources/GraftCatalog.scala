package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
class GraftCatalog extends CatalogPlugin with TableCatalog {

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

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog does not support ALTER TABLE; evolve schemas via commits")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog does not support DROP TABLE; use TimeTravel.vacuum/purge")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog is path-addressed: rename the directory, not the table")
}
