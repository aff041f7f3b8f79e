package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** EXPORT a versioned-table snapshot AS an Iceberg table — the second
  * publish direction beside [[DeltaExport]]: metadata JSON + Avro
  * manifest list + Avro manifest with ABSOLUTE data-file paths (the
  * spec stores full URIs in `data_file.file_path`, which is what makes
  * this zero-copy). The graft table's immutable files never move.
  *
  * Same loud-or-exact scope as the Delta export: pending deletion
  * vectors or a column mapping cannot be represented by plain file
  * lists, so both decline with the OPTIMIZE fix named. Field types
  * must map to the Iceberg interchange set.
  *
  * Scale: O(files) driver work — one manifest read, one Avro manifest
  * + list + one JSON write; no data bytes touched. The export pins a
  * VERSION; later graft commits don't shear the published table.
  */
object IcebergExport {

  private def icebergType(t: DataType): String = t match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case StringType => "string"
    case DateType => "date"
    case TimestampType => "timestamp"
    case other => throw new UnsupportedOperationException(
      s"column type $other has no Iceberg interchange mapping; cast before export")
  }

  /** Write Iceberg metadata at `targetPath` exposing
    * `sourcePath`@`version` (default latest). Returns the number of
    * data files published. */
  def snapshot(spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None): Int = {
    val v = version.getOrElse(TimeTravel.versions(spark, sourcePath).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no versions at $sourcePath")))
    if (TimeTravel.dvListing(spark, sourcePath, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"snapshot v$v of $sourcePath has pending deletion vectors; run " +
          "TimeTravel.optimize to fold them, then export the folded version")
    if (TimeTravel.colsListing(spark, sourcePath, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"snapshot v$v of $sourcePath resolves through a column mapping; run " +
          "TimeTravel.optimize to rewrite, then export the folded version")
    val dirs = TimeTravel.listing(spark, sourcePath, v)
    val scan = spark.read.parquet(dirs.map(d => s"$sourcePath/$d"): _*)
    val files = scan.inputFiles.sorted.toSeq
    val existing = new java.io.File(s"$targetPath/metadata")
    if (existing.exists()) throw new IllegalStateException(
      s"$targetPath already carries Iceberg metadata; export to a fresh path")
    val fields = scan.schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      (i + 1, f.name, !f.nullable, icebergType(f.dataType))
    }
    val m = IcebergRead.Fixture.manifest(targetPath, "m-export.avro",
      files.map(f => (1, f, 0)))
    val ml = IcebergRead.Fixture.manifestList(targetPath, "snap-export.avro", Seq(m))
    IcebergRead.Fixture.metadata(targetPath, 1, formatVersion = 2,
      snapshotId = v, manifestList = ml, fields = fields)
    files.length
  }
}
