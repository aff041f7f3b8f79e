package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** EXPORT a versioned-table snapshot AS an Iceberg v2 table — the
  * second publish direction beside [[DeltaExport]], zero-copy: the
  * metadata chain carries ABSOLUTE data-file URIs (the spec's usual
  * shape), so the graft table's immutable files never move.
  *
  * The emitted chain is SPEC-COMPLETE v2 (the r10 ADVICE close — the
  * earlier export reused the reader-test fixtures, whose minimal
  * manifests real engines reject): manifest entries carry
  * status/snapshot_id/sequence_number and a `data_file` with content,
  * file_path, file_format, partition, record_count (from the parquet
  * footers), file_size_in_bytes — every field tagged with its
  * spec field-id in the Avro schema; the manifest list carries
  * manifest_length, partition_spec_id, content, sequence bounds,
  * added/existing/deleted file and row counts; the metadata JSON
  * carries last-sequence-number, last-updated-ms, last-column-id,
  * schemas (field ids), partition-specs/default-spec-id,
  * sort-orders/default-sort-order-id, snapshot summary and
  * snapshot-log. In-sandbox verification is the independent
  * [[IcebergRead]] replay (no external engine exists here); the
  * structures follow the public spec field-for-field.
  *
  * [[append]] keeps the published table CURRENT: later graft APPEND
  * commits publish as new snapshots of the same table — a new
  * manifest beside the existing ones, a new metadata version, the
  * version-hint bumped — and ROW-LEVEL graft commits publish as
  * POSITION-DELETE files (one `deletes/pd-*.parquet` of (file_path,
  * pos) pairs per publish, referenced by a content=1 delete manifest
  * — the spec's merge-on-read shape; prior delete files stay live in
  * the reused manifests, so the union is the cumulative tombstone
  * set). The graft version each snapshot mirrors rides in
  * `properties` (`graft.source-version`). Rewrite / schema-change
  * graft commits decline loudly (re-export).
  *
  * `formatVersion = 3` (r13) publishes the FORMAT-VERSION-3 shape
  * instead: row-level deletes land as puffin DELETION VECTORS
  * ([[Puffin]], one `deletion-vector-v1` blob per affected data
  * file), each carrying the file's CUMULATIVE deleted positions —
  * the v3 at-most-one-DV-per-file rule, so an append that deletes
  * from an already-vectored file writes ONE superseding vector and
  * drops the file's prior DV entry from the carried-forward
  * manifests ([[writeExistingDeleteManifest]]). v3 row lineage is
  * maintained: metadata `next-row-id`, snapshot `first-row-id`, and
  * explicit per-data-file `first_row_id` (142) / manifest-list
  * `first_row_id` (520). append recovers the format version from the
  * published metadata, so a table keeps its shape for life.
  *
  * Same loud-or-exact scope as the Delta export: a FRESH snapshot
  * with pending deletion vectors, or any snapshot with a column
  * mapping, cannot be represented by plain file lists, so both
  * decline with the fix named (OPTIMIZE and re-export — or, for
  * deletes, export first and let append publish them). Field types
  * must map to the Iceberg interchange set.
  *
  * Scale: O(files) driver work per publish (one footer read per new
  * file for its row count); no data bytes move. append is O(new
  * files) — old manifests are REUSED by reference, the spec's own
  * incremental-append shape.
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
    // TimestampType is a UTC-adjusted instant → the spec's
    // `timestamptz`; zoneless TimestampNTZType → `timestamp` — the
    // [[IcebergRead.sparkType]] inverse, so exports roundtrip
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case other => throw new UnsupportedOperationException(
      s"column type $other has no Iceberg interchange mapping; cast before export")
  }

  // ----------------------------------------------- spec-complete Avro

  /** One Avro field tagged with its Iceberg spec field-id. */
  /** Optional (nullable) spec field — the v3 additions are all
    * optional in the Avro sense: null on entries they don't apply to. */
  private def optFld(name: String, schema: Schema, fieldId: Int): Schema.Field = {
    val union = Schema.createUnion(java.util.List.of(
      Schema.create(Schema.Type.NULL), schema))
    val f = new Schema.Field(name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
    f.addProp("field-id", fieldId: Integer)
    f
  }

  private def fld(name: String, schema: Schema, fieldId: Int): Schema.Field = {
    val f = new Schema.Field(name, schema, null, null.asInstanceOf[Object])
    f.addProp("field-id", fieldId: Integer)
    f
  }

  private def longS = Schema.create(Schema.Type.LONG)
  private def intS = Schema.create(Schema.Type.INT)
  private def stringS = Schema.create(Schema.Type.STRING)

  /** data_file (v2 required fields); the `partition` record carries
    * one typed field per identity-partition column (empty when
    * unpartitioned). `v3` adds the format-version-3 optional fields:
    * row-lineage `first_row_id` (142) and the deletion-vector
    * coordinates `referenced_data_file` (143) / `content_offset` (144)
    * / `content_size_in_bytes` (145). */
  private def dataFileSchema(partCols: Seq[PartCol], v3: Boolean = false): Schema = {
    val partition = Schema.createRecord("r102", null, null, false)
    val pfields = partCols.map { pc =>
      val base = pc.icebergType match {
        case "long" => longS
        case "int" => intS
        case "string" => stringS
        case other => throw new UnsupportedOperationException(
          s"partition column type $other is outside the export's identity " +
            "set (long, int, string)")
      }
      fld(pc.name, base, pc.fieldId)
    }
    partition.setFields(java.util.List.of(pfields: _*))
    val s = Schema.createRecord("r2", null, null, false)
    // the spec's field-id-keyed statistics maps encode as arrays of
    // key/value records, ids per the data_file field list
    def kvArr(recName: String, keyId: Int, valId: Int, valType: Schema): Schema = {
      val rec = Schema.createRecord(recName, null, null, false)
      rec.setFields(java.util.List.of(
        fld("key", intS, keyId), fld("value", valType, valId)))
      Schema.createArray(rec) // optFld adds the null branch
    }
    val bytesS = Schema.create(Schema.Type.BYTES)
    val base = Seq(
      fld("content", intS, 134),
      fld("file_path", stringS, 100),
      fld("file_format", stringS, 101),
      fld("partition", partition, 102),
      fld("record_count", longS, 103),
      fld("file_size_in_bytes", longS, 104),
      optFld("null_value_counts", kvArr("k121_v122", 121, 122, longS), 110),
      optFld("lower_bounds", kvArr("k126_v127", 126, 127, bytesS), 125),
      optFld("upper_bounds", kvArr("k129_v130", 129, 130, bytesS), 128),
      optFld("equality_ids", {
        // field 135, element id 136 — REQUIRED on content=2 entries,
        // null everywhere else
        val a = Schema.createArray(intS)
        a.addProp("element-id", 136: Integer)
        a
      }, 135))
    val v3Extras =
      if (!v3) Nil
      else Seq(
        optFld("first_row_id", longS, 142),
        optFld("referenced_data_file", stringS, 143),
        optFld("content_offset", longS, 144),
        optFld("content_size_in_bytes", longS, 145))
    s.setFields(java.util.List.of(base ++ v3Extras: _*))
    s
  }

  private def manifestEntrySchema(partCols: Seq[PartCol], v3: Boolean = false): Schema = {
    val s = Schema.createRecord("manifest_entry", null, null, false)
    s.setFields(java.util.List.of(
      fld("status", intS, 0),
      fld("snapshot_id", longS, 1),
      fld("sequence_number", longS, 3),
      fld("file_sequence_number", longS, 4),
      fld("data_file", dataFileSchema(partCols, v3), 2)))
    s
  }

  /** `v3` adds the manifest-list row-lineage field: `first_row_id`
    * (520), the base the manifest's data entries inherit. */
  private def manifestFileSchema(v3: Boolean = false): Schema = {
    val s = Schema.createRecord("manifest_file", null, null, false)
    val base = Seq(
      fld("manifest_path", stringS, 500),
      fld("manifest_length", longS, 501),
      fld("partition_spec_id", intS, 502),
      fld("content", intS, 517),
      fld("sequence_number", longS, 515),
      fld("min_sequence_number", longS, 516),
      fld("added_snapshot_id", longS, 503),
      fld("added_files_count", intS, 504),
      fld("existing_files_count", intS, 505),
      fld("deleted_files_count", intS, 506),
      fld("added_rows_count", longS, 512),
      fld("existing_rows_count", longS, 513),
      fld("deleted_rows_count", longS, 514))
    val v3Extras = if (!v3) Nil else Seq(optFld("first_row_id", longS, 520))
    s.setFields(java.util.List.of(base ++ v3Extras: _*))
    s
  }

  /** `partValues` aligns with the export's partition columns (empty
    * when unpartitioned) — Avro-ready Long/Int/String values. `dv`
    * makes the file a v3 DELETION-VECTOR entry: (referenced data file,
    * content_offset, content_size_in_bytes) into the puffin `path`.
    * The field-id-keyed bounds maps carry the spec's single-value-
    * serialized per-column statistics external engines (and
    * [[IcebergRead]]'s own [[FileSkipping]]) prune files with. */
  private final case class NewFile(path: String, recordCount: Long,
      sizeInBytes: Long, partValues: Seq[Any] = Nil,
      dv: Option[(String, Long, Long)] = None,
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty,
      nullCounts: Map[Int, Long] = Map.empty,
      equalityIds: Seq[Int] = Nil)

  /** One partition column of a partitioned publish: `fieldId` is the
    * spec's partition field id (1000+), `srcId` the source schema
    * field id. `transform` is "identity" or "day" (r15 — the spec's
    * time layout: the partition value is days-from-epoch INT derived
    * from a timestamp/date source, so external engines time-prune
    * graft-published tables); `srcType` is the SOURCE column's type
    * (= `icebergType` for identity; for day, icebergType is "int"
    * while the source is a timestamp/date). */
  private final case class PartCol(name: String, icebergType: String,
      fieldId: Int, srcId: Int, transform: String = "identity",
      srcType: String = "", srcNameOpt: Option[String] = None) {
    /** The SOURCE column the footer statistics come from. */
    def srcName: String = srcNameOpt.getOrElse(name)
  }

  /** The schema's JSON serialization — written identically into the
    * metadata JSON and into every manifest's Avro key-value metadata
    * (the spec requires each manifest to carry the schema it was
    * written under). */
  private def schemaJson(fields: Seq[(Int, String, Boolean, String)],
      schemaId: Int = 0): String = {
    val fjson = fields.map { case (id, n, req, t) =>
      s"""{"id":$id,"name":"$n","required":$req,"type":"$t"}"""
    }.mkString(",")
    s"""{"type":"struct","schema-id":$schemaId,"fields":[$fjson]}"""
  }

  /** The spec's name-mapping property value, JSON-escaped for embedding:
    * graft-written parquet carries no Iceberg field ids, and
    * `schema.name-mapping.default` is the spec's sanctioned bridge —
    * engines resolve id-less files by these (field-id → names) rules
    * instead of refusing the scan. */
  private def nameMappingJson(fields: Seq[(Int, String, Boolean, String)]): String = {
    val rules = fields.map { case (id, n, _, _) =>
      s"""{"field-id":$id,"names":["$n"]}"""
    }.mkString("[", ",", "]")
    rules.replace("\"", "\\\"")
  }

  /** Deterministic REAL table UUID (RFC-4122 name-based): stable across
    * metadata versions of the same export target, so engines that key
    * table identity on `table-uuid` see one table through appends. */
  private def tableUuid(dir: String): java.util.UUID =
    java.util.UUID.nameUUIDFromBytes(
      s"graft-iceberg-export:$dir".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Parquet footer row count + file length — O(footer) driver reads.
    * With `partCols`, also derives each file's IDENTITY partition tuple
    * from the footer's column statistics: every partition column must
    * be PARTITION-PURE in every file (min == max across all row
    * groups, no nulls) or the export declines loudly — a file spanning
    * two partition values cannot be represented by an identity spec. */
  /** Iceberg single-value serialization of one parquet-statistics value
    * for the given iceberg type: little-endian numerics, UTF-8 strings
    * — the bytes `lower_bounds`/`upper_bounds` carry. None for types
    * outside the serialized set (bounds are optional). */
  private def singleValueBytes(itype: String, v: Any): Option[Array[Byte]] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    try itype match {
      case "long" | "timestamp" | "timestamptz" =>
        Some(le(8).putLong(v.asInstanceOf[Number].longValue()).array())
      case "int" | "date" =>
        Some(le(4).putInt(v.asInstanceOf[Number].intValue()).array())
      case "double" =>
        val d = v.asInstanceOf[Number].doubleValue()
        if (d.isNaN || d.isInfinite) None else Some(le(8).putDouble(d).array())
      case "float" =>
        val d = v.asInstanceOf[Number].floatValue()
        if (d.isNaN || d.isInfinite) None else Some(le(4).putFloat(d).array())
      case "boolean" =>
        Some(Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0))
      case "string" =>
        Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
      case _ => None // decimals et al: bounds are optional, omit
    } catch { case _: Exception => None }
  }

  private def describeFiles(spark: SparkSession, files: Seq[String],
      partCols: Seq[PartCol] = Nil,
      statFields: Seq[(Int, String, Boolean, String)] = Nil,
      knownValues: Map[String, Seq[Any]] = Map.empty): Seq[NewFile] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    files.map { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      val (n, values, lo, hi, nulls) = try {
        val footer = rdr.getFooter
        // per-column bounds for the schema's interchange columns, from
        // the same footer already open for the row count: row-group
        // statistics merge through parquet's own comparators; columns
        // without usable statistics are omitted (bounds are optional)
        val loB = Map.newBuilder[Int, Array[Byte]]
        val hiB = Map.newBuilder[Int, Array[Byte]]
        val nullB = Map.newBuilder[Int, Long]
        statFields.foreach { case (id, name, _, itype) =>
          val chunks = footer.getBlocks.asScala.flatMap(_.getColumns.asScala
            .filter(_.getPath.toDotString == name))
          val statsL = chunks.map(_.getStatistics)
          if (statsL.nonEmpty && !statsL.exists(s => s == null || s.isEmpty)) {
            val merged = statsL.reduceLeft { (a, b) =>
              val m = a.copy(); m.mergeStatistics(b); m
            }
            nullB += id -> merged.getNumNulls
            if (merged.hasNonNullValue) for {
              loBytes <- singleValueBytes(itype, merged.genericGetMin)
              hiBytes <- singleValueBytes(itype, merged.genericGetMax)
            } {
              loB += id -> loBytes
              hiB += id -> hiBytes
            }
          }
        }
        val vals = partCols.zipWithIndex.map { case (pc, pcIdx) =>
          // bucket[N] is NOT monotonic — a file's bucket cannot derive
          // from its min/max bounds. Bucket values arrive pre-derived
          // (one distributed distinct-per-file scan, or the staged
          // write's own tuple bookkeeping) via `knownValues`.
          if (pc.transform.startsWith("bucket[")) {
            knownValues.get(PathKeys.normKey(f)) match {
              case Some(tuple) => tuple(pcIdx)
              case None => throw new IllegalStateException(
                s"bucket partition value for $f was not pre-derived — " +
                  "internal: the caller must scan-derive bucket tuples")
            }
          } else {
          val chunks = footer.getBlocks.asScala.flatMap(_.getColumns.asScala
            .filter(_.getPath.toDotString == pc.srcName))
          if (chunks.isEmpty) throw new UnsupportedOperationException(
            s"partition column ${pc.srcName} is not a top-level column of $f")
          val stats = chunks.map(_.getStatistics)
          if (stats.exists(s => s == null || !s.hasNonNullValue) ||
              stats.exists(_.getNumNulls > 0))
            throw new UnsupportedOperationException(
              s"partition column ${pc.srcName} in $f carries nulls or no " +
                "statistics; a partitioned export needs pure non-null " +
                "values per file")
          // identity: raw stat values must agree; transforms: the
          // TRANSFORMED values must — values inside one file may
          // differ as long as every one lands on the same partition.
          // Sound for every MONOTONIC transform even over conservative
          // bounds: transform(lo) == transform(hi) pins every value
          // in [lo, hi] to that same partition value.
          def epochDaysOf(v: Any): Int = pc.srcType match {
            case "date" => v.asInstanceOf[Number].intValue()
            case _ => // timestamp/timestamptz: INT64 micros from epoch
              graft.expressions.IcebergTransforms.epochDaysOfMicros(
                v.asInstanceOf[Number].longValue())
          }
          def conv(v: Any): Any = pc.transform match {
            case "day" => epochDaysOf(v)
            case "hour" => graft.expressions.IcebergTransforms
              .epochHoursOfMicros(v.asInstanceOf[Number].longValue())
            case "month" => graft.expressions.IcebergTransforms
              .monthsOfEpochDays(epochDaysOf(v))
            case "year" => graft.expressions.IcebergTransforms
              .yearsOfEpochDays(epochDaysOf(v))
            case TruncSpecRe(w) => pc.srcType match {
              case "int" => graft.expressions.IcebergTransforms
                .truncateInt(v.asInstanceOf[Number].intValue(), w.toInt)
              case "long" => graft.expressions.IcebergTransforms
                .truncateLong(v.asInstanceOf[Number].longValue(), w.toLong)
              case _ =>
                val s = v.asInstanceOf[org.apache.parquet.io.api.Binary]
                  .toStringUsingUTF8
                // first W CODEPOINTS (the spec's rule, not chars)
                val cp = s.codePointCount(0, s.length)
                if (cp <= w.toInt) s
                else s.substring(0, s.offsetByCodePoints(0, w.toInt))
            }
            case _ => v match {
              case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
              case other => other
            }
          }
          val distinct = stats.flatMap(s =>
            Seq(conv(s.genericGetMin), conv(s.genericGetMax))).distinct
          if (distinct.size != 1) throw new UnsupportedOperationException(
            s"file $f is not partition-pure on ${pc.name} " +
              s"(values ${distinct.take(2).mkString(", ")}…); repartition the " +
              "source by the partition values before a partitioned export")
          distinct.head
          }
        }
        (rdr.getRecordCount, vals, loB.result(), hiB.result(), nullB.result())
      } finally rdr.close()
      NewFile(f, n, fs.getFileStatus(p).getLen, values,
        lowerBounds = lo, upperBounds = hi, nullCounts = nulls)
    }
  }

  /** One written manifest, as the manifest list will reference it:
    * content 0 = data, 1 = position deletes / deletion vectors;
    * `specId` names the partition spec its entries were written under
    * (deletes of a partitioned table publish GLOBAL — the empty spec).
    * `firstRowId` is the v3 row-lineage base of a data manifest's
    * entries; `existingCount`/`existingRows`/`minSeq` describe
    * REWRITTEN manifests (entries carried forward as EXISTING when a
    * DV replacement drops some of a prior manifest's entries). */
  private final case class ManifestRef(path: String, length: Long,
      fileCount: Int, rowCount: Long, content: Int, specId: Int = 0,
      firstRowId: Option[Long] = None, existingCount: Int = 0,
      existingRows: Long = 0L, minSeq: Option[Long] = None)

  /** The spec fields of a partition spec (identity / day transforms),
    * as the JSON both the table metadata and each manifest's
    * key-value metadata carry. */
  private def partSpecFieldsJson(partCols: Seq[PartCol]): String =
    partCols.map(pc =>
      s"""{"name":"${pc.name}","transform":"${pc.transform}",""" +
        s""""source-id":${pc.srcId},"field-id":${pc.fieldId}}""")
      .mkString("[", ",", "]")

  /** Write one ADDED-entries manifest (data, position-delete, or v3
    * deletion-vector files, per `content`/`NewFile.dv`), under the
    * given partition columns and spec id. With `v3`, data entries get
    * explicit row-lineage `first_row_id` assigned from `firstRowBase`
    * in entry order (each file consumes `record_count` ids — the v3
    * spec's assignment rule, written explicitly so external readers
    * need no inheritance step). */
  private def writeManifest(dir: String, name: String, snapshotId: Long,
      seqNum: Long, files: Seq[NewFile],
      fields: Seq[(Int, String, Boolean, String)], content: Int = 0,
      partCols: Seq[PartCol] = Nil, specId: Int = 0,
      v3: Boolean = false, firstRowBase: Option[Long] = None,
      schemaId: Int = 0): ManifestRef = {
    val entrySchema = manifestEntrySchema(partCols, v3)
    val dfSchema = entrySchema.getField("data_file").schema()
    val f = new java.io.File(s"$dir/metadata/$name")
    f.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](entrySchema))
    w.setMeta("format-version", if (v3) "3" else "2")
    w.setMeta("content", if (content == 0) "data" else "deletes")
    // key-value metadata the spec REQUIRES of every manifest (r11
    // ADVICE close — external engines reject manifests without them)
    w.setMeta("schema", schemaJson(fields, schemaId))
    w.setMeta("schema-id", schemaId.toString)
    w.setMeta("partition-spec", partSpecFieldsJson(partCols))
    w.setMeta("partition-spec-id", specId.toString)
    w.create(entrySchema, f)
    var nextRow = firstRowBase.getOrElse(0L)
    files.foreach { nf =>
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", if (nf.dv.nonEmpty) 1 else content)
      dfr.put("file_path", nf.path)
      dfr.put("file_format", if (nf.dv.nonEmpty) "PUFFIN" else "PARQUET")
      val pr = new GenericData.Record(dfSchema.getField("partition").schema())
      partCols.zip(nf.partValues).foreach { case (pc, v) => pr.put(pc.name, v) }
      dfr.put("partition", pr)
      dfr.put("record_count", nf.recordCount)
      dfr.put("file_size_in_bytes", nf.sizeInBytes)
      nf.dv.foreach { case (ref, off, len) =>
        dfr.put("referenced_data_file", ref)
        dfr.put("content_offset", off: java.lang.Long)
        dfr.put("content_size_in_bytes", len: java.lang.Long)
      }
      if (nf.equalityIds.nonEmpty) {
        val arrSchema = dfSchema.getField("equality_ids").schema().getTypes.get(1)
        val arr = new GenericData.Array[Integer](nf.equalityIds.size, arrSchema)
        nf.equalityIds.foreach(i => arr.add(i: Integer))
        dfr.put("equality_ids", arr)
      }
      def kvArrOf(field: String, pairs: Seq[(Int, AnyRef)]): Unit =
        if (pairs.nonEmpty) {
          val arrSchema = dfSchema.getField(field).schema().getTypes.get(1)
          val arr = new GenericData.Array[GenericRecord](pairs.size, arrSchema)
          pairs.sortBy(_._1).foreach { case (k, v) =>
            val r = new GenericData.Record(arrSchema.getElementType)
            r.put("key", k); r.put("value", v)
            arr.add(r)
          }
          dfr.put(field, arr)
        }
      kvArrOf("null_value_counts",
        nf.nullCounts.toSeq.map { case (k, v) => k -> (v: java.lang.Long) })
      kvArrOf("lower_bounds", nf.lowerBounds.toSeq
        .map { case (k, v) => k -> java.nio.ByteBuffer.wrap(v) })
      kvArrOf("upper_bounds", nf.upperBounds.toSeq
        .map { case (k, v) => k -> java.nio.ByteBuffer.wrap(v) })
      if (v3 && content == 0 && nf.dv.isEmpty && firstRowBase.nonEmpty) {
        dfr.put("first_row_id", nextRow: java.lang.Long)
        nextRow += nf.recordCount
      }
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", seqNum)
      e.put("file_sequence_number", seqNum)
      e.put("data_file", dfr)
      w.append(e)
    }
    w.close()
    ManifestRef(f.getAbsolutePath, f.length(), files.size,
      files.map(_.recordCount).sum, content, specId,
      firstRowId = if (v3 && content == 0) firstRowBase else None)
  }

  /** Write a manifest list = `prior` manifest_file records (reused by
    * reference — the incremental-append shape) + the new manifests. */
  private def writeManifestList(dir: String, name: String, snapshotId: Long,
      seqNum: Long, prior: Seq[GenericRecord],
      newManifests: Seq[ManifestRef], v3: Boolean = false): String = {
    import scala.jdk.CollectionConverters._
    val s = manifestFileSchema(v3)
    val f = new java.io.File(s"$dir/metadata/$name")
    f.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
    w.setMeta("format-version", if (v3) "3" else "2")
    w.setMeta("snapshot-id", snapshotId.toString)
    w.setMeta("sequence-number", seqNum.toString)
    w.create(s, f)
    prior.foreach { old =>
      val r = new GenericData.Record(s)
      // resolve each target field against the WRITER schema by spec
      // FIELD ID first (the spec's identity — the reference Iceberg
      // implementation names the count fields added_data_files_count/…
      // in Avro while the spec text says added_files_count), then by
      // name. Writer-only optional fields (e.g. the `partitions`
      // summaries, 507) are dropped from carried records — they are
      // advisory pruning stats, never correctness.
      val byId = old.getSchema.getFields.asScala.flatMap { wf =>
        Option(wf.getObjectProp("field-id"))
          .map(p => p.asInstanceOf[Number].intValue() -> wf.name())
      }.toMap
      s.getFields.forEach { fd =>
        val srcName = Option(fd.getObjectProp("field-id"))
          .map(_.asInstanceOf[Number].intValue()).flatMap(byId.get)
          .orElse(Option(old.getSchema.getField(fd.name())).map(_.name()))
        val v = srcName.map(old.get).orNull
        // a foreign prior list missing a spec-REQUIRED field (our
        // non-union fields) cannot be carried forward with a guessed
        // value — sequence numbers drive merge-on-read ordering
        if (v == null && fd.schema().getType != Schema.Type.UNION)
          throw new UnsupportedOperationException(
            s"prior manifest-list entry lacks required field ${fd.name()}; " +
              "cannot carry it forward into a new snapshot")
        r.put(fd.name(), v)
      }
      w.append(r)
    }
    newManifests.foreach { m =>
      val r = new GenericData.Record(s)
      r.put("manifest_path", m.path)
      r.put("manifest_length", m.length)
      r.put("partition_spec_id", m.specId)
      r.put("content", m.content)
      r.put("sequence_number", seqNum)
      r.put("min_sequence_number", m.minSeq.getOrElse(seqNum))
      r.put("added_snapshot_id", snapshotId)
      r.put("added_files_count", m.fileCount)
      r.put("existing_files_count", m.existingCount)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", m.rowCount)
      r.put("existing_rows_count", m.existingRows)
      r.put("deleted_rows_count", 0L)
      if (v3) r.put("first_row_id", m.firstRowId.map(Long.box).orNull)
      w.append(r)
    }
    w.close()
    f.getAbsolutePath
  }

  private def avroRecords(spark: SparkSession, p: Path): Seq[GenericRecord] = {
    val in = new FsInput(p, spark.sessionState.newHadoopConf())
    val rdr = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (rdr.hasNext) out += rdr.next()
      out.result()
    } finally rdr.close()
  }

  /** One snapshot's JSON fragment. `firstRowId` is the v3 row-lineage
    * base this snapshot assigned ids from. */
  private final case class Snap(id: Long, seqNum: Long, tsMs: Long,
      manifestList: String, operation: String,
      firstRowId: Option[Long] = None) {
    def json: String =
      s"""{"snapshot-id":$id,"sequence-number":$seqNum,"timestamp-ms":$tsMs,""" +
        s""""manifest-list":"$manifestList","summary":{"operation":"$operation"},""" +
        firstRowId.map(r => s""""first-row-id":$r,""").getOrElse("") +
        """"schema-id":0}"""
  }

  private def writeMetadata(dir: String, metaV: Int, sourceVersion: Long,
      fields: Seq[(Int, String, Boolean, String)], snaps: Seq[Snap],
      currentId: Long, partCols: Seq[PartCol] = Nil,
      formatVersion: Int = 2, nextRowId: Option[Long] = None): Unit = {
    val tsMs = System.currentTimeMillis()
    val slog = snaps.map(s => s"""{"timestamp-ms":${s.tsMs},"snapshot-id":${s.id}}""")
      .mkString(",")
    // a partitioned publish carries TWO specs: the identity spec (0,
    // the default) and the empty spec (1) its GLOBAL position-delete
    // manifests reference
    val specs =
      if (partCols.isEmpty) """[{"spec-id":0,"fields":[]}]"""
      else s"""[{"spec-id":0,"fields":${partSpecFieldsJson(partCols)}},""" +
        """{"spec-id":1,"fields":[]}]"""
    val lastPartId = if (partCols.isEmpty) 999 else partCols.map(_.fieldId).max
    val body =
      s"""{"format-version":$formatVersion,"table-uuid":"${tableUuid(dir)}","location":"$dir",
         |${nextRowId.map(n => s""""next-row-id":$n,""").getOrElse("")}
         |"last-sequence-number":${snaps.map(_.seqNum).max},
         |"last-updated-ms":$tsMs,"last-column-id":${fields.map(_._1).max},
         |"current-schema-id":0,
         |"schemas":[${schemaJson(fields)}],
         |"default-spec-id":0,"partition-specs":$specs,
         |"last-partition-id":$lastPartId,
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"properties":{"graft.source-version":"$sourceVersion",
         |"schema.name-mapping.default":"${nameMappingJson(fields)}"},
         |"current-snapshot-id":$currentId,
         |"refs":{"main":{"snapshot-id":$currentId,"type":"branch"}},
         |"snapshots":[${snaps.map(_.json).mkString(",")}],
         |"snapshot-log":[$slog],"metadata-log":[]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metadata/v$metaV.metadata.json"), body)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"), metaV.toString)
  }

  private def requireUnmapped(spark: SparkSession, sourcePath: String, v: Long): Unit =
    if (TimeTravel.colsListing(spark, sourcePath, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"snapshot v$v of $sourcePath resolves through a column mapping; run " +
          "TimeTravel.optimize to rewrite, then export the folded version")

  /** Scheme-normalized path key ([[DeltaExport]]'s normKey): graft DV
    * sidecars record `_metadata.file_path` URIs while the data
    * manifests record `inputFiles` URIs, and the two render the
    * scheme/authority differently (`file:///` vs `file:/`). */
  private def normKey(p: String): String = PathKeys.normKey(p)

  /** Publish the tombstones of `dvDirs` as ONE position-delete parquet
    * (`deletes/pd-<g>.parquet` of (file_path, pos) pairs, sorted by
    * file_path then pos as the spec requires) + a content=1 delete
    * manifest — the spec's merge-on-read shape. Each delete row's
    * `file_path` is rewritten to the EXACT string the data manifests
    * carry (`dataPaths`): external engines match byte-exact, so the
    * `_metadata.file_path` form the DV sidecars record would silently
    * fail to apply outside graft. */
  private def writeDeleteArtifacts(spark: SparkSession, sourcePath: String,
      targetPath: String, dvDirs: Seq[String], g: Long, snapId: Long,
      seqNum: Long, fields: Seq[(Int, String, Boolean, String)],
      dataPaths: Seq[String], delSpecId: Int = 0): ManifestRef = {
    import org.apache.spark.sql.functions.col
    val byKey = dataPaths.map(p => normKey(p) -> p).toMap
    if (byKey.size != dataPaths.size) throw new IllegalStateException(
      s"two manifest data paths normalize to one key at $targetPath — " +
        "cannot rewrite delete file_paths unambiguously")
    val raw = spark.read.parquet(dvDirs.map(d => s"$sourcePath/$d"): _*)
      .select(col(TimeTravel.DvCols.head).as("file_path"),
        col(TimeTravel.DvCols.last).cast("long").as("pos"))
      .distinct().collect()
    val pairRows = raw.map { r =>
      val manifestForm = byKey.getOrElse(normKey(r.getString(0)),
        throw new IllegalStateException(
          s"tombstoned file ${r.getString(0)} is not among the published " +
            s"data files of $targetPath — corrupt export state"))
      (manifestForm, r.getLong(1))
    }.sortBy(identity).toSeq // spec: position deletes sort by (file_path, pos)
    import spark.implicits._
    val pairs = pairRows.toDF("file_path", "pos")
      .coalesce(1).sortWithinPartitions("file_path", "pos")
    val stage = s"$targetPath/deletes/.stage-$g"
    pairs.write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("delete stage wrote no part"))
    val dst = new java.io.File(f"$targetPath/deletes/pd-$g%05d.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(): Unit
    }
    deleteRec(new java.io.File(stage))
    val delFiles = describeFiles(spark, Seq(dst.getAbsolutePath))
    // deletes of a partitioned table publish GLOBAL: the empty spec
    writeManifest(targetPath, f"md-$g%05d.avro", snapId, seqNum,
      delFiles, fields, content = 1, partCols = Nil, specId = delSpecId)
  }

  /** Publish tombstones as format-version-3 DELETION VECTORS: ONE
    * puffin sidecar (`deletes/dv-<g>.puffin`, [[Puffin.writeDvFile]])
    * holding one `deletion-vector-v1` blob per affected data file,
    * plus a content=1 manifest whose entries carry the spec's DV
    * coordinates (referenced_data_file 143 / content_offset 144 /
    * content_size_in_bytes 145). The v3 rule is AT MOST ONE DV PER
    * DATA FILE, each superseding every earlier delete of that file —
    * so only files with NEW tombstones (`newDvDirs`) get a vector, and
    * that vector carries the file's CUMULATIVE positions from
    * `allDvDirs` (the caller drops the files' prior DV entries).
    * Returns the manifest plus the normalized keys of the re-vectored
    * files. */
  private def writeDvArtifacts(spark: SparkSession, sourcePath: String,
      targetPath: String, allDvDirs: Seq[String], newDvDirs: Seq[String],
      g: Long, snapId: Long, seqNum: Long,
      fields: Seq[(Int, String, Boolean, String)],
      dataPaths: Seq[String], delSpecId: Int): (ManifestRef, Set[String]) = {
    import org.apache.spark.sql.functions.col
    val byKey = dataPaths.map(p => normKey(p) -> p).toMap
    if (byKey.size != dataPaths.size) throw new IllegalStateException(
      s"two manifest data paths normalize to one key at $targetPath — " +
        "cannot address deletion vectors unambiguously")
    def pairsOf(dirs: Seq[String]) = spark.read
      .parquet(dirs.map(d => s"$sourcePath/$d"): _*)
      .select(col(TimeTravel.DvCols.head).as("file_path"),
        col(TimeTravel.DvCols.last).cast("long").as("pos"))
      .distinct().collect()
      .map(r => (normKey(r.getString(0)), r.getLong(1)))
    val affected: Set[String] = pairsOf(newDvDirs).map(_._1).toSet
    val cumulative = pairsOf(allDvDirs).filter(p => affected(p._1))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (k, ps) =>
        val manifestForm = byKey.getOrElse(k, throw new IllegalStateException(
          s"tombstoned file $k is not among the published data files of " +
            s"$targetPath — corrupt export state"))
        (manifestForm, ps.map(_._2).toSeq.sorted)
      }
    val puffinPath =
      new java.io.File(f"$targetPath/deletes/dv-$g%05d.puffin").getAbsolutePath
    val refs = Puffin.writeDvFile(spark, puffinPath, cumulative, snapId, seqNum)
    val puffinLen = new java.io.File(puffinPath).length()
    val dvFiles = refs.map(r => NewFile(puffinPath, r.cardinality, puffinLen,
      dv = Some((r.referencedDataFile, r.offset, r.length))))
    val mref = writeManifest(targetPath, f"md-$g%05d.avro", snapId, seqNum,
      dvFiles, fields, content = 1, partCols = Nil, specId = delSpecId,
      v3 = true)
    (mref, affected)
  }

  /** Re-emit a prior delete manifest's surviving entries as EXISTING
    * (status 0, original snapshot/sequence numbers preserved) — the
    * carry-forward shape a DV replacement forces when some of a
    * manifest's vectors are superseded. `kept` must be non-empty (an
    * emptied manifest is simply omitted from the new list). */
  private def writeExistingDeleteManifest(dir: String, name: String,
      kept: Seq[GenericRecord], fields: Seq[(Int, String, Boolean, String)],
      specId: Int): ManifestRef = {
    val entrySchema = manifestEntrySchema(Nil, v3 = true)
    val dfSchema = entrySchema.getField("data_file").schema()
    val f = new java.io.File(s"$dir/metadata/$name")
    f.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](entrySchema))
    w.setMeta("format-version", "3")
    w.setMeta("content", "deletes")
    w.setMeta("schema", schemaJson(fields))
    w.setMeta("schema-id", "0")
    w.setMeta("partition-spec", partSpecFieldsJson(Nil))
    w.setMeta("partition-spec-id", specId.toString)
    w.create(entrySchema, f)
    var rows = 0L
    var minSeq = Long.MaxValue
    kept.foreach { old =>
      val odf = old.get("data_file").asInstanceOf[GenericRecord]
      def num(v: AnyRef) = v.asInstanceOf[Number].longValue()
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", 1)
      dfr.put("file_path", String.valueOf(odf.get("file_path")))
      dfr.put("file_format", String.valueOf(odf.get("file_format")))
      dfr.put("partition",
        new GenericData.Record(dfSchema.getField("partition").schema()))
      dfr.put("record_count", num(odf.get("record_count")))
      dfr.put("file_size_in_bytes", num(odf.get("file_size_in_bytes")))
      Option(odf.get("referenced_data_file")).foreach { r =>
        dfr.put("referenced_data_file", String.valueOf(r))
        dfr.put("content_offset", num(odf.get("content_offset")): java.lang.Long)
        dfr.put("content_size_in_bytes",
          num(odf.get("content_size_in_bytes")): java.lang.Long)
      }
      val seq = num(old.get("sequence_number"))
      minSeq = math.min(minSeq, seq)
      rows += num(odf.get("record_count"))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 0) // EXISTING
      e.put("snapshot_id", num(old.get("snapshot_id")))
      e.put("sequence_number", seq)
      e.put("file_sequence_number", num(old.get("file_sequence_number")))
      e.put("data_file", dfr)
      w.append(e)
    }
    w.close()
    ManifestRef(f.getAbsolutePath, f.length(), 0, 0L, 1, specId,
      existingCount = kept.size, existingRows = rows, minSeq = Some(minSeq))
  }

  /** The partition columns a `partitionBy` names, typed and id'd
    * against the export schema. The full spec transform family parses
    * here (r15): `days(c)` / `hours(c)` / `months(c)` / `years(c)`
    * (epoch units, INT), `bucket(N, c)` (the spec's murmur3 bucketing,
    * INT in [0,N)), `truncate(W, c)` (floor-to-width / string prefix),
    * and bare names as identity. */
  private val DaysRe = """days?\(\s*([^)\s]+)\s*\)""".r
  private val HoursRe = """hours?\(\s*([^)\s]+)\s*\)""".r
  private val MonthsRe = """months?\(\s*([^)\s]+)\s*\)""".r
  private val YearsRe = """years?\(\s*([^)\s]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
  /** Spec-form transform strings, as table metadata carries them. */
  private[sources] val BucketSpecRe = """bucket\[(\d+)\]""".r
  private[sources] val TruncSpecRe = """truncate\[(\d+)\]""".r

  private def timeUnitPartCol(kind: String, src: String, i: Int,
      fields: Seq[(Int, String, Boolean, String)]): PartCol = {
    val (srcId, _, _, t) = fields.find(_._2 == src).getOrElse(
      throw new IllegalArgumentException(
        s"partition column $src is not a column of the exported schema"))
    val allowed =
      if (kind == "hour") Set("timestamp", "timestamptz")
      else Set("timestamp", "timestamptz", "date")
    if (!allowed.contains(t))
      throw new UnsupportedOperationException(
        s"${kind}s($src) needs a ${if (kind == "hour") "timestamp"
        else "timestamp or date"} column; $src is $t")
    PartCol(s"${src}_$kind", "int", 1000 + i, srcId,
      transform = kind, srcType = t, srcNameOpt = Some(src))
  }

  private def partColsOf(partitionBy: Seq[String],
      fields: Seq[(Int, String, Boolean, String)]): Seq[PartCol] =
    partitionBy.zipWithIndex.map {
      case (DaysRe(src), i) => timeUnitPartCol("day", src, i, fields)
      case (HoursRe(src), i) => timeUnitPartCol("hour", src, i, fields)
      case (MonthsRe(src), i) => timeUnitPartCol("month", src, i, fields)
      case (YearsRe(src), i) => timeUnitPartCol("year", src, i, fields)
      case (BucketRe(n, src), i) =>
        val (srcId, _, _, t) = fields.find(_._2 == src).getOrElse(
          throw new IllegalArgumentException(
            s"partition column $src is not a column of the exported schema"))
        if (!Set("int", "long", "string", "date", "timestamp", "timestamptz")
            .contains(t))
          throw new UnsupportedOperationException(
            s"bucket($n, $src) covers int/long/string/date/timestamp; $src is $t")
        PartCol(s"${src}_bucket", "int", 1000 + i, srcId,
          transform = s"bucket[$n]", srcType = t, srcNameOpt = Some(src))
      case (TruncRe(w, src), i) =>
        val (srcId, _, _, t) = fields.find(_._2 == src).getOrElse(
          throw new IllegalArgumentException(
            s"partition column $src is not a column of the exported schema"))
        if (!Set("int", "long", "string").contains(t))
          throw new UnsupportedOperationException(
            s"truncate($w, $src) covers int/long/string; $src is $t")
        PartCol(s"${src}_trunc", t, 1000 + i, srcId,
          transform = s"truncate[$w]", srcType = t, srcNameOpt = Some(src))
      case (n, i) =>
        val (srcId, _, _, t) = fields.find(_._2 == n).getOrElse(
          throw new IllegalArgumentException(
            s"partition column $n is not a column of the exported schema"))
        if (!Set("long", "int", "string").contains(t))
          throw new UnsupportedOperationException(
            s"partition column $n has type $t; identity-partitioned export " +
              "supports long, int, and string (or a transform — days/hours/" +
              "months/years/bucket/truncate — over its allowed types)")
        PartCol(n, t, 1000 + i, srcId)
    }

  /** The published table's identity partition columns, recovered from
    * its metadata (the append path must keep writing the same spec). */
  private def partColsOfMeta(meta: JsonNode,
      fields: Seq[(Int, String, Boolean, String)]): Seq[PartCol] = {
    val specs = Option(meta.get("partition-specs")).getOrElse(return Nil)
    val want = Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
    val spec = (0 until specs.size()).map(specs.get)
      .find(_.get("spec-id").asInt() == want).getOrElse(return Nil)
    val pf = spec.get("fields")
    (0 until pf.size()).map(pf.get).map { f =>
      val tr = f.get("transform").asText()
      val srcId = f.get("source-id").asInt()
      val (_, srcName, _, t) = fields.find(_._1 == srcId).getOrElse(
        throw new IllegalStateException(
          s"partition source-id $srcId is not in the published schema"))
      // srcName resolves via source-id — a spec's DISPLAY name may
      // differ from the source column's (foreign layouts often do)
      tr match {
        case "identity" =>
          PartCol(f.get("name").asText(), t, f.get("field-id").asInt(),
            srcId, srcNameOpt = Some(srcName))
        case "day" | "hour" | "month" | "year" =>
          PartCol(f.get("name").asText(), "int", f.get("field-id").asInt(),
            srcId, transform = tr, srcType = t, srcNameOpt = Some(srcName))
        case BucketSpecRe(_) =>
          PartCol(f.get("name").asText(), "int", f.get("field-id").asInt(),
            srcId, transform = tr, srcType = t, srcNameOpt = Some(srcName))
        case TruncSpecRe(_) =>
          PartCol(f.get("name").asText(), t, f.get("field-id").asInt(),
            srcId, transform = tr, srcType = t, srcNameOpt = Some(srcName))
        case other => throw new UnsupportedOperationException(
          s"published spec uses transform $other; this exporter speaks " +
            "identity, day/hour/month/year, bucket[N], and truncate[W]")
      }
    }
  }

  private def fieldsOf(schema: StructType): Seq[(Int, String, Boolean, String)] =
    schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      (i + 1, f.name, !f.nullable, icebergType(f.dataType))
    }

  /** The Column computing one partition field's transform over its
    * source column — the exact per-row values the manifests must
    * carry ([[graft.expressions.IcebergTransforms]]). */
  private def transformColumn(pc: PartCol,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pc.transform match {
      case "identity" => c
      case "day" => graft.functions.IcebergPartitionFns.icebergDays(c)
      case "hour" => graft.functions.IcebergPartitionFns.icebergHours(c)
      case "month" => graft.functions.IcebergPartitionFns.icebergMonths(c)
      case "year" => graft.functions.IcebergPartitionFns.icebergYears(c)
      case BucketSpecRe(n) =>
        graft.functions.IcebergPartitionFns.icebergBucket(n.toInt, c)
      case TruncSpecRe(w) =>
        graft.functions.IcebergPartitionFns.icebergTruncate(w.toInt, c)
      case other => throw new UnsupportedOperationException(
        s"unknown transform $other")
    }

  /** Per-file partition tuples for specs whose transforms cannot
    * derive from footer bounds (bucket is not monotonic): ONE
    * distributed scan of only the partition SOURCE columns (pruned by
    * parquet projection), distinct per file, purity enforced loudly.
    * Keys are [[PathKeys.normKey]]-normalized paths; values align
    * with `partCols`. O(rows of the new files), but touching only the
    * partition columns — the price of a non-derivable transform. */
  private def scanDerivedTuples(spark: SparkSession, files: Seq[String],
      partCols: Seq[PartCol]): Map[String, Seq[Any]] = {
    import org.apache.spark.sql.functions.col
    val exprs = partCols.zipWithIndex.map { case (pc, i) =>
      transformColumn(pc, col(pc.srcName)).as(s"__gt$i")
    }
    val rows = spark.read.parquet(files: _*)
      .select(col("_metadata.file_path").as("__gf") +: exprs: _*)
      .distinct().collect()
    rows.groupBy(r => PathKeys.normKey(r.getString(0))).map { case (k, rs) =>
      if (rs.length != 1) throw new UnsupportedOperationException(
        s"file $k is not partition-pure on the spec's transforms " +
          s"(${rs.take(2).map(_.toSeq.drop(1).mkString("(", ",", ")"))
            .mkString(" vs ")}…); repartition the source by " +
          "graft.functions.IcebergPartitionFns transforms before export")
      k -> rs.head.toSeq.drop(1)
    }
  }

  private def hasBucket(partCols: Seq[PartCol]): Boolean =
    partCols.exists(_.transform.startsWith("bucket["))

  /** Staging publishes through local java.io/NIO; a non-local table
    * (hdfs://, s3a://) would see bogus relative local paths — decline
    * by name BEFORE any file is touched, the same stance
    * [[LakehouseMaintenance.expireSnapshots]] takes (r14 ADVICE). */
  private[sources] def requireLocalScheme(tablePath: String, op: String): Unit = {
    Option(new Path(tablePath).toUri.getScheme) match {
      case None | Some("file") => ()
      case Some(other) => throw new UnsupportedOperationException(
        s"$op stages files through local NIO; a table on scheme " +
          s"'$other' is unsupported")
    }
  }

  // ------------------------------------------- foreign write-back (r15)

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Fields of the table's CURRENT schema with their REAL ids — the
    * foreign-table counterpart of [[fieldsOf]]: graft exports assign
    * ids positionally, but an externally-created table's ids are
    * whatever its schema history produced, gaps included, and every
    * manifest/bounds/equality reference must use THOSE. Flat
    * interchange types only; a nested column declines by name. */
  private[sources] def fieldsOfMeta(meta: JsonNode): Seq[(Int, String, Boolean, String)] = {
    val schemas = Option(meta.get("schemas")).getOrElse(
      throw new UnsupportedOperationException(
        "table metadata carries no schemas list; foreign writes need the " +
          "v2+ metadata serialization"))
    val want = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
    val node = (0 until schemas.size()).map(schemas.get)
      .find(s => Option(s.get("schema-id")).forall(_.asInt() == want))
      .getOrElse(throw new IllegalStateException(
        s"current-schema-id $want is not in the schemas list"))
    val fs = node.get("fields")
    (0 until fs.size()).map(fs.get).map { f =>
      val t = f.get("type")
      if (!t.isTextual) throw new UnsupportedOperationException(
        s"column ${f.get("name").asText()} carries a nested type; " +
          "foreign writes cover the flat interchange set")
      (f.get("id").asInt(), f.get("name").asText(),
        Option(f.get("required")).exists(_.asBoolean()), t.asText())
    }
  }

  /** Snapshots parsed from metadata JSON. Foreign chains may omit
    * optional fields (sequence numbers, timestamps) — default 0, the
    * spec's v1-compatibility reading. */
  private def snapsOfMeta(meta: JsonNode): Seq[Snap] = {
    val arr = Option(meta.get("snapshots")).getOrElse(return Nil)
    (0 until arr.size()).map { i =>
      val s = arr.get(i)
      Snap(s.get("snapshot-id").asLong(),
        Option(s.get("sequence-number")).map(_.asLong()).getOrElse(0L),
        Option(s.get("timestamp-ms")).map(_.asLong()).getOrElse(0L),
        s.get("manifest-list").asText(),
        Option(s.get("summary")).flatMap(x => Option(x.get("operation")))
          .map(_.asText()).getOrElse("append"),
        firstRowId = Option(s.get("first-row-id")).map(_.asLong()))
    }
  }

  /** The table's NEWEST metadata file by numeric version, read fresh —
    * the OCC base. Deliberately ignores `version-hint.text` for the
    * version CHOICE (the hint is written after the CREATE_NEW, so a
    * crashed writer can leave it stale; the numeric max cannot go
    * backwards). Returns (version number, parsed JSON). */
  private def foreignBase(targetPath: String): (Int, JsonNode) = {
    val dirF = new java.io.File(s"$targetPath/metadata")
    val names = Option(dirF.list()).getOrElse(Array.empty[String])
      .filter(_.endsWith(".metadata.json"))
    if (names.isEmpty) throw new IllegalArgumentException(
      s"no *.metadata.json under $targetPath/metadata")
    val best = names.map { n =>
      ("""\d+""".r.findFirstIn(n).map(_.toLong).getOrElse(-1L), n)
    }.max
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$targetPath/metadata/${best._2}")),
      java.nio.charset.StandardCharsets.UTF_8)
    (best._1.toInt, jsonMapper.readTree(text))
  }

  /** Publish metadata v`metaV` of a FOREIGN table by deep-copying the
    * current JSON and appending ONE snapshot — every property, schema,
    * spec, sort order, and ref the external writer recorded survives
    * verbatim (rebuilding the graft shape would clobber them). The
    * CREATE_NEW write IS the put-if-absent OCC: two writers racing the
    * same version number → exactly one wins; the loser re-reads and
    * retries. `ensureEmptySpec` adds an empty partition spec (for a
    * global delete manifest) when the table doesn't already carry one;
    * returns nothing — the caller resolved the id via
    * [[emptySpecIdOf]] against the SAME base metadata. */
  private def commitForeignMeta(targetPath: String, meta: JsonNode, metaV: Int,
      snapId: Long, seqNum: Long, manifestList: String, operation: String,
      firstRowId: Option[Long], nextRowId: Option[Long],
      ensureEmptySpec: Option[Int] = None,
      ref: Option[String] = None): Unit = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    val ts = System.currentTimeMillis()
    val root = meta.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
    val sn = root.withArray("snapshots").addObject()
    sn.put("snapshot-id", snapId)
    sn.put("sequence-number", seqNum)
    sn.put("timestamp-ms", ts)
    sn.put("manifest-list", manifestList)
    sn.putObject("summary").put("operation", operation)
    firstRowId.foreach(r => sn.put("first-row-id", r))
    Option(root.get("current-schema-id")).foreach(id =>
      sn.put("schema-id", id.asInt()))
    root.put("last-sequence-number", seqNum)
    root.put("last-updated-ms", ts)
    nextRowId.foreach(n => root.put("next-row-id", n))
    ref match {
      case None =>
        // MAIN commit: advance the current pointer, the main ref, and
        // the spec's main-history snapshot-log
        root.put("current-snapshot-id", snapId)
        Option(root.get("refs")).collect { case o: ObjectNode => o }
          .foreach { refs =>
            Option(refs.get("main")).collect { case m: ObjectNode => m }
              .foreach(_.put("snapshot-id", snapId))
          }
        if (root.has("snapshot-log")) {
          val e = root.withArray("snapshot-log").addObject()
          e.put("timestamp-ms", ts); e.put("snapshot-id", snapId): Unit
        }
      case Some(name) =>
        // BRANCH commit (r15): only the named ref moves — main, the
        // current pointer, and the main snapshot-log stay untouched
        val refs = Option(root.get("refs")).collect { case o: ObjectNode => o }
          .getOrElse(throw new IllegalArgumentException(
            s"no refs at $targetPath; create the branch first"))
        val node = Option(refs.get(name)).collect { case o: ObjectNode => o }
          .getOrElse(throw new IllegalArgumentException(
            s"no ref '$name' at $targetPath; create the branch first"))
        if (Option(node.get("type")).exists(_.asText() == "tag"))
          throw new UnsupportedOperationException(
            s"ref '$name' at $targetPath is a TAG — tags are immutable; " +
              "commit to a branch")
        node.put("snapshot-id", snapId): Unit
    }
    ensureEmptySpec.foreach { id =>
      val specs = root.withArray("partition-specs")
      val present = (0 until specs.size()).map(specs.get)
        .exists(s => s.get("spec-id").asInt() == id)
      if (!present) {
        val sp = specs.addObject()
        sp.put("spec-id", id)
        sp.putArray("fields"): Unit
      }
    }
    publishForeignMeta(targetPath, root, metaV)
  }

  /** Write metadata v`metaV` under CREATE_NEW (the put-if-absent OCC)
    * and leave the advisory hint MONOTONIC: a slower concurrent winner
    * naively stamping its own (lower) number would point readers at a
    * stale version, so every writer converges the hint on the dir's
    * numeric max — the final global write can never leave it below. */
  private def publishForeignMeta(targetPath: String,
      root: JsonNode, metaV: Int): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$targetPath/metadata/v$metaV.metadata.json"),
      jsonMapper.writeValueAsBytes(root),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    val hintP = java.nio.file.Paths.get(s"$targetPath/metadata/version-hint.text")
    var settled = false
    while (!settled) {
      val maxV = Option(new java.io.File(s"$targetPath/metadata").list())
        .getOrElse(Array.empty[String]).filter(_.endsWith(".metadata.json"))
        .flatMap(n => """\d+""".r.findFirstIn(n).map(_.toLong))
        .foldLeft(metaV.toLong)(math.max)
      val cur = try new String(java.nio.file.Files.readAllBytes(hintP)).trim.toLong
        catch { case _: Exception => -1L }
      if (cur >= maxV) settled = true
      else java.nio.file.Files.writeString(hintP, maxV.toString): Unit
    }
  }

  // ------------------------------------------------- ref writes (r15)

  /** CREATE a named branch or tag (r14 verdict #6 — the write half of
    * [[IcebergRead.readRef]]): a metadata-only commit via the same
    * deep-copy mutation + CREATE_NEW OCC as foreign appends, so it
    * works on graft exports and foreign tables alike. Points at
    * `snapshotId` (default: the current snapshot); the name must be
    * free. Returns the pinned snapshot id. */
  def createRef(spark: SparkSession, targetPath: String, name: String,
      refType: String = "branch", snapshotId: Option[Long] = None,
      maxRetries: Int = 3): Long = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    requireLocalScheme(targetPath, "createRef")
    require(refType == "branch" || refType == "tag",
      s"ref type must be 'branch' or 'tag', got '$refType'")
    require(name.nonEmpty && name != "main",
      "ref name must be non-empty and not 'main'")
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      val (baseV, meta) = foreignBase(targetPath)
      val root = meta.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
      val refs = Option(root.get("refs")).collect { case o: ObjectNode => o }
        .getOrElse(root.putObject("refs"))
      if (refs.has(name)) throw new IllegalArgumentException(
        s"ref '$name' already exists at $targetPath; drop it first")
      val sid = snapshotId.orElse(
        Option(root.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L))
        .getOrElse(throw new IllegalStateException(
          s"no current snapshot at $targetPath to pin '$name' to"))
      if (!snapsOfMeta(meta).exists(_.id == sid))
        throw new IllegalArgumentException(
          s"snapshot $sid is not in the snapshot list of $targetPath")
      val node = refs.putObject(name)
      node.put("snapshot-id", sid)
      node.put("type", refType): Unit
      root.put("last-updated-ms", System.currentTimeMillis())
      try { publishForeignMeta(targetPath, root, baseV + 1); return sid }
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          lastErr = e; attempt += 1
      }
    }
    throw new java.io.IOException(
      s"ref commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }

  /** DROP a named ref — `main` refuses (the table's identity pointer);
    * an unknown name is loud. */
  def dropRef(spark: SparkSession, targetPath: String, name: String,
      maxRetries: Int = 3): Unit = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    requireLocalScheme(targetPath, "dropRef")
    require(name != "main", "refusing to drop 'main'")
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      val (baseV, meta) = foreignBase(targetPath)
      val root = meta.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
      val refs = Option(root.get("refs")).collect { case o: ObjectNode => o }
        .filter(_.has(name))
        .getOrElse(throw new IllegalArgumentException(
          s"no ref '$name' at $targetPath"))
      refs.remove(name): Unit
      root.put("last-updated-ms", System.currentTimeMillis())
      try { publishForeignMeta(targetPath, root, baseV + 1); return }
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          lastErr = e; attempt += 1
      }
    }
    throw new java.io.IOException(
      s"ref commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }

  /** The spec id a GLOBAL (empty-partition) delete manifest should
    * reference in this table: an existing empty spec's id when the
    * table carries one, else the next free id (the commit then
    * publishes the new empty spec — writers may add specs). */
  private def emptySpecIdOf(meta: JsonNode): Int = {
    val specs = Option(meta.get("partition-specs")).getOrElse(return 0)
    val parsed = (0 until specs.size()).map(specs.get)
    parsed.find(s => Option(s.get("fields")).forall(_.size() == 0))
      .map(_.get("spec-id").asInt())
      .getOrElse(parsed.map(_.get("spec-id").asInt()).max + 1)
  }

  /** Stage `df` as field-id-tagged parquet under `targetPath/data`
    * with the table's partition layout (identity and every served
    * transform — the `__gp` broadcast-map write), validating
    * `required` columns from the staged footers; returns the
    * described files ready for a manifest. The shared write half of
    * [[appendForeign]] and [[updateForeign]]. */
  private def stageForeignData(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, targetPath: String,
      fields: Seq[(Int, String, Boolean, String)], partCols: Seq[PartCol],
      uuid: String): Seq[NewFile] = {
    import org.apache.spark.sql.functions.{assert_true, broadcast, col, lit, when => sqlWhen}
    val requiredCols = fields.filter(_._3).map(_._2)
    // persist when a pass beyond the write reads the frame (the
    // partition-tuple collect) — same nondeterminism stance as the
    // Delta twin. `required` validates from the STAGED footers, not
    // an aggregate prepass, so it forces no persist and no second
    // read; a violating append fails BEFORE any file is published.
    val multiPass = partCols.nonEmpty
    val src = if (multiPass)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    val stage = s"$targetPath/_graft_staging_$uuid"
    val conf = spark.sessionState.newHadoopConf()
    val fsys = new Path(targetPath).getFileSystem(conf)
    val sel = fields.map { case (id, n, _, _) =>
      col(n).as(n, new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", id.toLong).build())
    }
    def requireStagedRequired(): Unit =
      if (requiredCols.nonEmpty) {
        val counts = DeltaExport.stagedNullCounts(conf, new Path(stage),
          requiredCols)
        val violated = requiredCols.flatMap { c =>
          counts(c) match {
            case Some(0L) => None
            case Some(n) => Some(s"$c ($n nulls)")
            case None => throw new IllegalStateException(
              s"staged files carry no null-count statistics for $c; " +
                "cannot validate the required column")
          }
        }
        if (violated.nonEmpty) throw new IllegalArgumentException(
          s"appendForeign frame carries nulls in required column(s) of " +
            s"$targetPath: ${violated.mkString(", ")}")
      }
    def publish(staged: Path, destName: String): String = {
      val dest = new Path(s"$targetPath/data", destName)
      fsys.mkdirs(dest.getParent)
      if (!fsys.rename(staged, dest)) throw new java.io.IOException(
        s"staging publish failed for $dest")
      dest.toUri.getPath
    }
    val stagedPaths = Seq.newBuilder[String]
    try {
      if (partCols.isEmpty) {
        src.select(sel: _*).write.mode("overwrite").parquet(stage)
        requireStagedRequired()
        fsys.listStatus(new Path(stage)).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, i) =>
            stagedPaths += publish(s.getPath, s"gf-$uuid-$i.parquet")
          }
      } else {
        // partitioning: the same broadcast tuple→index map + ONE
        // partitionBy("__gp") write as the Delta twin — tuples are the
        // TRANSFORMED values (identity = the column itself), so every
        // spec transform groups here; the real source columns STAY in
        // the data files (the shape engines write), and
        // [[describeFiles]] re-derives each file's tuple from footer
        // stats with the purity check (bucket, non-monotonic, rides
        // `knownValues` from one distinct-per-file scan instead)
        // the data side binds the SOURCE column names (the spec's
        // display name may differ); the manifest partition record
        // keeps the spec names via writeManifest
        val tCols = partCols.zipWithIndex.map { case (pc, i) =>
          transformColumn(pc, col(pc.srcName)).as(s"__gt$i")
        }
        val tSchema = src.select(tCols: _*).schema
        val tuples = src.select(tCols: _*).distinct().collect()
        if (tuples.exists(r => (0 until r.size).exists(r.isNullAt)))
          throw new UnsupportedOperationException(
            s"null partition values at $targetPath are outside this " +
              "writer's set")
        val idxSchema = StructType(
          tSchema.fields.map(_.copy(nullable = true)).toSeq :+
            StructField("__gp", IntegerType, nullable = false))
        import scala.jdk.CollectionConverters._
        val idxDf = spark.createDataFrame(
          tuples.zipWithIndex.map { case (r, i) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
          }.toSeq.asJava, idxSchema)
        val joined = src.as("l").join(broadcast(idxDf.as("r")),
          partCols.zipWithIndex.map { case (pc, i) =>
            transformColumn(pc, col(s"l.${pc.srcName}")) <=> col(s"r.__gt$i")
          }.reduce(_ && _), "left")
        val gpGuarded = sqlWhen(
          assert_true(col("r.__gp").isNotNull,
            lit("appendForeign: row's partition tuple is absent from the " +
              "collected map — nondeterministic input re-evaluated?")).isNull,
          col("r.__gp")).as("__gp")
        // the join leaves partition-column names on BOTH sides — the
        // data projection must bind the LEFT (data) occurrences
        val selL = fields.map { case (id, n, _, _) =>
          col(s"l.$n").as(n, new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id", id.toLong).build())
        }
        joined.select(selL :+ gpGuarded: _*)
          .write.partitionBy("__gp").mode("overwrite").parquet(stage)
        requireStagedRequired()
        tuples.indices.foreach { i =>
          val dir = new Path(stage, s"__gp=$i")
          if (fsys.exists(dir))
            fsys.listStatus(dir).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, k) =>
                stagedPaths += publish(s.getPath, s"gf-$uuid-$i-$k.parquet")
              }
        }
      }
    } finally {
      if (multiPass) src.unpersist(): Unit
      fsys.delete(new Path(stage), true): Unit
    }
    describeFiles(spark, stagedPaths.result(), partCols,
      statFields = fields,
      knownValues = if (hasBucket(partCols))
        scanDerivedTuples(spark, stagedPaths.result(), partCols)
      else Map.empty)
  }

  /** APPEND `df` into ANY Iceberg table — including tables this
    * engine did not create (r14 verdict #1, the asymmetric half of
    * [[DeltaExport.appendForeign]]): stage the rows as new parquet
    * data files under the table root (columns tagged with the
    * table's REAL field ids, partition-pure per its identity spec),
    * write one ADDED manifest plus a manifest list carrying the
    * current snapshot's manifests forward by reference, and publish
    * the next metadata version by MUTATING the current JSON —
    * properties, schema ids, specs, sort orders, refs all survive
    * verbatim — under a put-if-absent CREATE_NEW with bounded OCC
    * retry (re-validating schema and spec against the re-read state).
    *
    * Loud-or-exact scope: format-version 2 or 3 only (v1 manifests
    * speak a different entry shape); the frame's schema must match
    * the table's current schema by name and type; `required` columns
    * are validated null-free with one aggregate (the spec's writer
    * obligation); the spec transform family is served in full (r15):
    * identity over long/int/string, day/hour/month/year epoch units,
    * `bucket[N]` (spec murmur3 — the common Flink-CDC layout), and
    * `truncate[W]` — anything else declines by name in
    * [[partColsOfMeta]]; a v3 table
    * must carry `next-row-id` (row lineage is maintained: per-file
    * `first_row_id`, manifest-list `first_row_id`, snapshot
    * `first-row-id`, bumped `next-row-id`).
    *
    * Scale: one distributed write of `df` plus O(new files) driver
    * footer reads; the conflict window is one CREATE_NEW, independent
    * of data size. Returns the new snapshot id. */
  def appendForeign(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
      targetPath: String, maxRetries: Int = 3,
      ref: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.{assert_true, broadcast, col, lit, when => sqlWhen}
    requireLocalScheme(targetPath, "appendForeign")
    val (v0, meta0) = foreignBase(targetPath)
    val fv = Option(meta0.get("format-version")).map(_.asInt()).getOrElse(1)
    if (fv != 2 && fv != 3) throw new UnsupportedOperationException(
      s"iceberg table at $targetPath is format-version $fv; foreign writes " +
        "speak versions 2 and 3")
    val v3 = fv == 3
    val fields = fieldsOfMeta(meta0)
    val partCols = partColsOfMeta(meta0, fields)
    partCols.foreach { pc =>
      val ok = pc.transform match {
        case "identity" => Set("long", "int", "string").contains(pc.icebergType)
        case "day" | "month" | "year" =>
          Set("timestamp", "timestamptz", "date").contains(pc.srcType)
        case "hour" => Set("timestamp", "timestamptz").contains(pc.srcType)
        case BucketSpecRe(_) =>
          Set("int", "long", "string", "date", "timestamp", "timestamptz")
            .contains(pc.srcType)
        case TruncSpecRe(_) => Set("int", "long", "string").contains(pc.srcType)
        case _ => false
      }
      if (!ok) throw new UnsupportedOperationException(
        s"partition field ${pc.name} uses transform ${pc.transform} over " +
          s"${if (pc.srcType.isEmpty) pc.icebergType else pc.srcType}; " +
          "foreign appends cover identity (long/int/string), " +
          "day/hour/month/year, bucket[N], and truncate[W] over their " +
          "spec-allowed source types")
    }
    if (v3 && !meta0.has("next-row-id")) throw new UnsupportedOperationException(
      s"format-version-3 table at $targetPath carries no next-row-id; " +
        "v3 requires row lineage — cannot assign row ids")
    // schema check by NAME + type; ids belong to the table
    val dfTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def matches(n: String, t: String): Boolean = dfTypes.get(n).exists { dt =>
      try icebergType(dt) == t
      catch { case _: UnsupportedOperationException => false }
    }
    if (df.schema.size != fields.size ||
        fields.exists { case (_, n, _, t) => !matches(n, t) })
      throw new UnsupportedOperationException(
        s"appendForeign frame schema ${df.schema.simpleString} does not " +
          s"match the table schema (${fields.map(f => s"${f._2}: ${f._4}")
            .mkString(", ")}) at $targetPath")
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val files = stageForeignData(spark, df, targetPath, fields, partCols,
      uuid)
    val addedRows = files.map(_.recordCount).sum
    // OCC: the data files are final; manifests + list are cheap and
    // rewritten per attempt (they embed the racing seq/snapshot ids)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      val (baseV, meta) = if (attempt == 0) (v0, meta0) else foreignBase(targetPath)
      if (attempt > 0 &&
          (fieldsOfMeta(meta) != fields || partColsOfMeta(meta, fields) != partCols))
        throw new IllegalStateException(
          s"concurrent schema or spec change at $targetPath moved the table " +
            "under this append; re-read and retry explicitly", lastErr)
      val snaps = snapsOfMeta(meta)
      val seqNum = math.max(
        Option(meta.get("last-sequence-number")).map(_.asLong()).getOrElse(0L),
        snaps.map(_.seqNum).foldLeft(0L)(math.max)) + 1
      val taken = snaps.map(_.id).toSet
      var snapId = (1L << 41) | seqNum
      while (taken(snapId)) snapId += 1
      val rowBase = Option(meta.get("next-row-id")).map(_.asLong())
      if (v3 && rowBase.isEmpty) throw new IllegalStateException(
        s"concurrent writer dropped next-row-id at $targetPath", lastErr)
      val specId = Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
      val schemaId = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
      val mref = writeManifest(targetPath, f"mf-$uuid-a$attempt.avro", snapId,
        seqNum, files, fields, partCols = partCols, specId = specId, v3 = v3,
        firstRowBase = if (v3) rowBase else None, schemaId = schemaId)
      // the commit extends the HEAD it targets: main's current
      // snapshot, or — for a branch commit (r15) — the named ref's
      val headId: Option[Long] = ref match {
        case Some(name) =>
          val refs = IcebergRead.refsOf(meta)
          val (sid, tpe) = refs.getOrElse(name,
            throw new IllegalArgumentException(
              s"no ref '$name' at $targetPath; create the branch first"))
          if (tpe == "tag") throw new UnsupportedOperationException(
            s"ref '$name' at $targetPath is a TAG — tags are immutable; " +
              "commit to a branch")
          Some(sid)
        case None =>
          Option(meta.get("current-snapshot-id")).map(_.asLong())
            .filter(_ != -1L)
      }
      val prior = headId.flatMap(id => snaps.find(_.id == id)) match {
        case Some(s) => avroRecords(spark,
          IcebergRead.resolve(targetPath, s.manifestList))
        case None => Nil
      }
      val ml = writeManifestList(targetPath, f"snap-gf-$uuid-a$attempt.avro",
        snapId, seqNum, prior, Seq(mref), v3 = v3)
      try {
        commitForeignMeta(targetPath, meta, baseV + 1, snapId, seqNum, ml,
          "append",
          firstRowId = if (v3) rowBase else None,
          nextRowId = if (v3) rowBase.map(_ + addedRows) else None,
          ref = ref)
        return snapId
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          lastErr = e
          attempt += 1
      }
    }
    throw new java.io.IOException(
      s"commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }

  /** Write Iceberg metadata at `targetPath` exposing
    * `sourcePath`@`version` (default latest). Returns the number of
    * data files published. */
  /** `partitionBy` publishes an IDENTITY partition spec (r13): each
    * data file's tuple derives from its parquet column statistics, so
    * the source files must be partition-pure (loud otherwise) — the
    * shape a `repartition(partCols)`-then-commit source produces.
    * External engines then prune the published table by partition;
    * position-delete manifests publish GLOBAL (the empty spec). */
  def snapshot(spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None, partitionBy: Seq[String] = Nil,
      formatVersion: Int = 2): Int = {
    if (formatVersion != 2 && formatVersion != 3)
      throw new IllegalArgumentException(
        s"IcebergExport publishes format-version 2 or 3, not $formatVersion")
    val v3 = formatVersion == 3
    val v = version.getOrElse(TimeTravel.versions(spark, sourcePath).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no versions at $sourcePath")))
    requireUnmapped(spark, sourcePath, v)
    val dirs = TimeTravel.listing(spark, sourcePath, v)
    val scan = spark.read.parquet(dirs.map(d => s"$sourcePath/$d"): _*)
    val fields = fieldsOf(scan.schema)
    val partCols = partColsOf(partitionBy, fields)
    val files = describeFiles(spark, scan.inputFiles.sorted.toSeq, partCols,
      statFields = fields,
      knownValues = if (hasBucket(partCols))
        scanDerivedTuples(spark, scan.inputFiles.sorted.toSeq, partCols)
      else Map.empty)
    val existing = new java.io.File(s"$targetPath/metadata")
    if (existing.exists()) throw new IllegalStateException(
      s"$targetPath already carries Iceberg metadata; export to a fresh path " +
        "(IcebergExport.append publishes follow-up commits)")
    val snapId = v
    val manifests = Seq.newBuilder[ManifestRef]
    manifests += writeManifest(targetPath, f"m-$v%05d.avro", snapId, 1L, files,
      fields, partCols = partCols, v3 = v3,
      firstRowBase = if (v3) Some(0L) else None)
    // pending merge-on-read tombstones export directly in the same
    // first snapshot: a position-delete file (v2) or puffin deletion
    // vectors (v3) + a content=1 delete manifest
    val dvDirs = TimeTravel.dvListing(spark, sourcePath, v)
    if (dvDirs.nonEmpty) {
      val delSpecId = if (partCols.isEmpty) 0 else 1
      if (v3) manifests += writeDvArtifacts(spark, sourcePath, targetPath,
        dvDirs, dvDirs, v, snapId, 1L, fields, files.map(_.path), delSpecId)._1
      else manifests += writeDeleteArtifacts(spark, sourcePath, targetPath,
        dvDirs, v, snapId, 1L, fields, files.map(_.path), delSpecId)
    }
    val ml = writeManifestList(targetPath, f"snap-$v%05d.avro", snapId, 1L, Nil,
      manifests.result(), v3 = v3)
    writeMetadata(targetPath, 1, v, fields,
      Seq(Snap(snapId, 1L, System.currentTimeMillis(), ml,
        if (dvDirs.nonEmpty) "overwrite" else "append",
        firstRowId = if (v3) Some(0L) else None)), snapId, partCols,
      formatVersion = formatVersion,
      nextRowId = if (v3) Some(files.map(_.recordCount).sum) else None)
    files.length
  }

  /** APPEND the graft commits since the last export as a new snapshot
    * of the already-published table. Only intervening APPEND graft
    * commits qualify; row-level / rewrite / schema-change commits
    * decline loudly (re-export a fresh snapshot). Returns the number
    * of data files appended (0 = already current). */
  def append(spark: SparkSession, sourcePath: String, targetPath: String,
      toVersion: Option[Long] = None): Int = {
    val meta = IcebergRead.currentMetadata(spark, targetPath)
    val g0 = Option(meta.get("properties"))
      .flatMap(p => Option(p.get("graft.source-version"))).map(_.asText().toLong)
      .getOrElse(throw new IllegalStateException(
        s"the Iceberg table at $targetPath was not produced by IcebergExport " +
          "(no graft.source-version property); append only follows graft exports"))
    val g1 = toVersion.getOrElse(TimeTravel.versions(spark, sourcePath).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no versions at $sourcePath")))
    if (g1 <= g0) return 0
    requireUnmapped(spark, sourcePath, g1)
    var rowLevel = false
    ((g0 + 1) to g1).foreach { v =>
      TimeTravel.classifyCommit(spark, sourcePath, v) match {
        case TimeTravel.Append => ()
        case TimeTravel.RowLevel => rowLevel = true
        case kind => throw new UnsupportedOperationException(
          s"graft commit v$v of $sourcePath is a $kind; appends and row-level " +
            "commits publish incrementally — export a fresh snapshot for " +
            "rewrite/DDL changes")
      }
    }
    val newDirs = TimeTravel.listing(spark, sourcePath, g1)
      .filterNot(TimeTravel.listing(spark, sourcePath, g0).toSet)
    val metaV = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$targetPath/metadata/version-hint.text"))).trim.toInt
    val fv = Option(meta.get("format-version")).map(_.asInt()).getOrElse(2)
    val v3 = fv == 3
    val priorSnaps = {
      val arr = meta.get("snapshots")
      (0 until arr.size()).map { i =>
        val s = arr.get(i)
        Snap(s.get("snapshot-id").asLong(), s.get("sequence-number").asLong(),
          Option(s.get("timestamp-ms")).map(_.asLong()).getOrElse(0L),
          s.get("manifest-list").asText(),
          Option(s.get("summary")).flatMap(x => Option(x.get("operation")))
            .map(_.asText()).getOrElse("append"),
          firstRowId = Option(s.get("first-row-id")).map(_.asLong()))
      }
    }
    val rowBase = Option(meta.get("next-row-id")).map(_.asLong())
    if (v3 && rowBase.isEmpty) throw new IllegalStateException(
      s"format-version-3 table at $targetPath carries no next-row-id — " +
        "corrupt export state (v3 requires row lineage)")
    val fields = fieldsOf(IcebergRead.schemaOf(meta))
    val partCols = partColsOfMeta(meta, fields)
    if (newDirs.isEmpty && !rowLevel) { // metadata-only: bump the watermark
      writeMetadata(targetPath, metaV + 1, g1, fields, priorSnaps,
        meta.get("current-snapshot-id").asLong(), partCols,
        formatVersion = fv, nextRowId = rowBase)
      return 0
    }
    val seqNum = priorSnaps.map(_.seqNum).max + 1
    val snapId = g1
    val manifests = Seq.newBuilder[ManifestRef]
    var newFiles = Seq.empty[NewFile]
    if (newDirs.nonEmpty) {
      val scan = spark.read.parquet(newDirs.map(d => s"$sourcePath/$d"): _*)
      if (fieldsOf(scan.schema).map(t => (t._2, t._4)) != fields.map(t => (t._2, t._4)))
        throw new UnsupportedOperationException(
          s"graft commits after v$g0 changed the data schema at $sourcePath; " +
            "the published Iceberg schema is pinned — re-export a fresh snapshot")
      newFiles = describeFiles(spark, scan.inputFiles.sorted.toSeq, partCols,
        statFields = fields,
        knownValues = if (hasBucket(partCols))
          scanDerivedTuples(spark, scan.inputFiles.sorted.toSeq, partCols)
        else Map.empty)
      manifests += writeManifest(targetPath, f"m-$g1%05d.avro", snapId, seqNum,
        newFiles, fields, partCols = partCols, v3 = v3, firstRowBase = rowBase)
    }
    var revectored = Set.empty[String] // normKeys whose prior DV is superseded
    if (rowLevel) {
      // the window's NEW tombstones are exactly the dv directories the
      // manifests appended after g0 (graft dv listings accumulate until
      // an optimize, which classifies Rewrite and never reaches here).
      // v2: they publish as one POSITION-DELETE file + a content=1
      // manifest; prior delete files stay live in the reused manifests
      // and union to the cumulative tombstone set. v3: each affected
      // data file gets ONE superseding deletion vector with its
      // cumulative positions ([[writeDvArtifacts]]) and the file's
      // prior DV entries are dropped from the carried-forward manifests
      val dvAll = TimeTravel.dvListing(spark, sourcePath, g1)
      val dvNew = dvAll.filterNot(TimeTravel.dvListing(spark, sourcePath, g0).toSet)
      if (dvNew.isEmpty) throw new IllegalStateException(
        s"row-level commits in (v$g0, v$g1] of $sourcePath left no new " +
          "deletion-vector directories — corrupt manifest state")
      // the delete rows must carry the byte-exact file_path the data
      // manifests recorded: prior snapshots' live data entries plus
      // this publish's new files cover every referenceable target
      val priorDataPaths = IcebergRead
        .liveEntries(spark, targetPath, meta).filter(_.content == 0).map(_.path)
      val delSpecId = if (partCols.isEmpty) 0 else 1
      if (v3) {
        val (mref, affected) = writeDvArtifacts(spark, sourcePath, targetPath,
          dvAll, dvNew, g1, snapId, seqNum, fields,
          priorDataPaths ++ newFiles.map(_.path), delSpecId)
        manifests += mref
        revectored = affected
      } else manifests += writeDeleteArtifacts(spark, sourcePath, targetPath,
        dvNew, g1, snapId, seqNum, fields,
        priorDataPaths ++ newFiles.map(_.path), delSpecId)
    }
    val priorRecords = avroRecords(spark,
      IcebergRead.resolve(targetPath, priorSnaps.last.manifestList))
    // carry prior manifests forward — for a v3 DV replacement, delete
    // manifests holding a superseded vector are rewritten without it
    // (surviving entries as EXISTING), or omitted when emptied
    val priorKept = Seq.newBuilder[GenericRecord]
    priorRecords.zipWithIndex.foreach { case (rec, i) =>
      val content = Option(rec.get("content"))
        .map(_.asInstanceOf[Number].intValue()).getOrElse(0)
      if (revectored.isEmpty || content == 0) priorKept += rec
      else {
        val mPath = IcebergRead.resolve(targetPath,
          String.valueOf(rec.get("manifest_path")))
        val entries = avroRecords(spark, mPath)
        val (dropped, kept) = entries.partition { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          Option(if (df.getSchema.getField("referenced_data_file") == null) null
            else df.get("referenced_data_file"))
            .exists(r => revectored(normKey(String.valueOf(r))))
        }
        if (dropped.isEmpty) priorKept += rec
        else if (kept.nonEmpty)
          manifests += writeExistingDeleteManifest(targetPath,
            f"md-$g1%05d-c$i.avro", kept, fields,
            Option(rec.get("partition_spec_id"))
              .map(_.asInstanceOf[Number].intValue()).getOrElse(0))
      }
    }
    val ml = writeManifestList(targetPath, f"snap-$g1%05d.avro", snapId, seqNum,
      priorKept.result(), manifests.result(), v3 = v3)
    writeMetadata(targetPath, metaV + 1, g1, fields,
      priorSnaps :+ Snap(snapId, seqNum, System.currentTimeMillis(), ml,
        if (rowLevel) "overwrite" else "append", firstRowId = rowBase),
      snapId, partCols, formatVersion = fv,
      nextRowId = rowBase.map(_ + newFiles.map(_.recordCount).sum))
    manifests.result().map(_.fileCount).sum
  }

  /** Publish EQUALITY DELETES (content=2) as a new snapshot of an
    * exported table — the Flink-CDC producer shape (r14, r13 verdict
    * #5; reads of content=2 files already work, this closes the write
    * side): `keys` names a SUBSET of the table's columns; on read, a
    * data row dies iff some key row matches its values on those
    * columns AND the data file's sequence number is STRICTLY OLDER
    * than this snapshot's — the spec ordering [[IcebergRead]] applies
    * and the roundtrip test pins (rows appended AFTER the delete
    * survive the same key). Works on v2 and v3 exports; the delete
    * parquet lands under `deletes/eq-*.parquet` carrying the table
    * FIELD IDS so external engines bind it by id, the manifest entry
    * carries `equality_ids`, and the snapshot rides the next sequence
    * number. Global-scope deletes of a partitioned table publish under
    * the empty spec, like the position-delete path. Returns the new
    * snapshot id.
    *
    * Scale: O(key rows) — one bounded parquet + one manifest; prior
    * manifests are reused by reference. */
  def appendEqualityDeletes(spark: SparkSession, targetPath: String,
      keys: org.apache.spark.sql.DataFrame, maxRetries: Int = 3): Long = {
    requireLocalScheme(targetPath, "appendEqualityDeletes")
    val (v0, meta0) = foreignBase(targetPath)
    val fv = Option(meta0.get("format-version")).map(_.asInt()).getOrElse(1)
    if (fv != 2 && fv != 3) throw new UnsupportedOperationException(
      s"iceberg table at $targetPath is format-version $fv; foreign writes " +
        "speak versions 2 and 3")
    val v3 = fv == 3
    // field ids come from the table's OWN schema (r15: externally
    // created tables carry non-positional ids; the graft.source-version
    // requirement is lifted — graft exports pass through identically
    // because their ids ARE positional)
    val fields = fieldsOfMeta(meta0)
    val partCols = partColsOfMeta(meta0, fields)
    if (snapsOfMeta(meta0).isEmpty) throw new IllegalStateException(
      s"no snapshots at $targetPath; export or append a snapshot first")
    val byName = fields.map(t => t._2 -> t).toMap
    require(keys.columns.nonEmpty, "equality delete needs at least one column")
    val eqIds = keys.columns.toSeq.map { c =>
      val f = byName.getOrElse(c, throw new IllegalArgumentException(
        s"equality column '$c' is not in the table schema of $targetPath " +
          s"(${fields.map(_._2).mkString(", ")})"))
      val got = icebergType(keys.schema(c).dataType)
      if (got != f._4) throw new IllegalArgumentException(
        s"equality column '$c' is ${f._4} in the table but $got in the keys")
      f._1
    }
    // the delete file carries the table FIELD IDS at every column so
    // id-binding engines resolve it without name guessing; staged ONCE
    // (uuid-named — the snapshot id is chosen per OCC attempt)
    import org.apache.spark.sql.functions.col
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val withIds = keys.select(keys.columns.toSeq.map { c =>
      col(c).as(c, new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", byName(c)._1.toLong).build())
    }: _*).distinct()
    val stage = s"$targetPath/deletes/.stage-eq-$uuid"
    withIds.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("equality stage wrote no part"))
    val dst = new java.io.File(s"$targetPath/deletes/eq-$uuid.parquet")
    dst.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dst.toPath)
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(): Unit
    }
    deleteRec(new java.io.File(stage))
    val delFiles = describeFiles(spark, Seq(dst.getAbsolutePath))
      .map(_.copy(equalityIds = eqIds))
    // OCC commit: the delete parquet is final; manifest + list rewrite
    // per attempt (they embed the racing seq/snapshot ids)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      val (baseV, meta) = if (attempt == 0) (v0, meta0) else foreignBase(targetPath)
      if (attempt > 0 &&
          (fieldsOfMeta(meta) != fields || partColsOfMeta(meta, fields) != partCols))
        throw new IllegalStateException(
          s"concurrent schema or spec change at $targetPath moved the table " +
            "under this delete; re-read and retry explicitly", lastErr)
      val snaps = snapsOfMeta(meta)
      val seqNum = math.max(
        Option(meta.get("last-sequence-number")).map(_.asLong()).getOrElse(0L),
        snaps.map(_.seqNum).foldLeft(0L)(math.max)) + 1
      // OUT of the graft-version id space (snapshot/append stamp ids
      // from graft versions): a later append must never collide with
      // an equality-delete snapshot's id — high bit + the growing
      // sequence number, bumped past any foreign id already taken
      val taken = snaps.map(_.id).toSet
      var snapId = (1L << 40) | seqNum
      while (taken(snapId)) snapId += 1
      val rowBase = Option(meta.get("next-row-id")).map(_.asLong())
      val schemaId = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
      // a GLOBAL delete manifest references an EMPTY spec: the table's
      // default when unpartitioned, an existing empty spec otherwise —
      // or a fresh one the commit publishes alongside the snapshot
      val delSpecId =
        if (partCols.isEmpty)
          Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
        else emptySpecIdOf(meta)
      val mref = writeManifest(targetPath, s"me-$uuid-a$attempt.avro", snapId,
        seqNum, delFiles, fields, content = 2, partCols = Nil,
        specId = delSpecId, v3 = v3, schemaId = schemaId)
      val cur = Option(meta.get("current-snapshot-id")).map(_.asLong())
        .filter(_ != -1L).flatMap(id => snaps.find(_.id == id))
        .getOrElse(snaps.last)
      val priorRecords = avroRecords(spark,
        IcebergRead.resolve(targetPath, cur.manifestList))
      val ml = writeManifestList(targetPath, s"snap-eq-$uuid-a$attempt.avro",
        snapId, seqNum, priorRecords, Seq(mref), v3 = v3)
      try {
        commitForeignMeta(targetPath, meta, baseV + 1, snapId, seqNum, ml,
          "overwrite",
          firstRowId = if (v3) rowBase else None,
          nextRowId = None, // deletes assign no row ids
          ensureEmptySpec = if (partCols.isEmpty) None else Some(delSpecId))
        return snapId
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          lastErr = e
          attempt += 1
      }
    }
    throw new java.io.IOException(
      s"commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }

  /** PREDICATE-based merge-on-read DELETE into ANY v2/v3 Iceberg table
    * (r15 — the positional sibling of [[appendEqualityDeletes]], and
    * the Iceberg face of [[DeltaExport.deleteForeign]]): matched rows'
    * physical coordinates ((data file, row position), existing deletes
    * already applied via [[IcebergRead.readWithPositions]]) publish as
    *
    *   - v2: ONE position-delete parquet (`deletes/pdf-*.parquet`) of
    *     (file_path, pos) rows sorted as the spec requires, carrying
    *     the reserved field ids 2147483546/2147483545 so id-binding
    *     engines resolve it, with a content=1 manifest;
    *   - v3: puffin DELETION VECTORS, one `deletion-vector-v1` blob
    *     per affected file (position-delete FILES are forbidden in
    *     v3). A file that ALREADY carries a DV gets ONE SUPERSEDING
    *     vector holding its cumulative old ∪ new positions, and the
    *     prior vector's entry is dropped from the carried-forward
    *     manifests (survivors rewritten as EXISTING) — the spec's
    *     at-most-one-DV rule, honored on foreign chains too; a retry
    *     that finds a racing commit re-vectored one of our files
    *     fails loudly instead of resurrecting its tombstones.
    *
    * Same OCC as the other foreign writes: snapshot id outside the
    * graft-version space, CREATE_NEW put-if-absent, bounded retry with
    * schema/spec re-validation. Data files are never touched — cost is
    * O(matched rows), the MoR trade. Nondeterministic predicates
    * decline. Zero matches commit nothing and return the current
    * snapshot id. */
  def deleteForeign(spark: SparkSession, targetPath: String,
      predicate: org.apache.spark.sql.Column, maxRetries: Int = 3): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
    requireLocalScheme(targetPath, "deleteForeign")
    val (v0, meta0) = foreignBase(targetPath)
    val fv = Option(meta0.get("format-version")).map(_.asInt()).getOrElse(1)
    if (fv != 2 && fv != 3) throw new UnsupportedOperationException(
      s"iceberg table at $targetPath is format-version $fv; foreign writes " +
        "speak versions 2 and 3")
    val v3 = fv == 3
    val fields = fieldsOfMeta(meta0)
    val partCols = partColsOfMeta(meta0, fields)
    val snaps0 = snapsOfMeta(meta0)
    if (snaps0.isEmpty) throw new IllegalStateException(
      s"no snapshots at $targetPath; export or append a snapshot first")
    val curId = Option(meta0.get("current-snapshot-id")).map(_.asLong())
      .filter(_ != -1L).getOrElse(snaps0.last.id)
    val rows = IcebergRead.readWithPositions(spark, targetPath)
    val matchedF = coalesce(predicate, lit(false))
    val detOk = rows.filter(matchedF).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.deterministic
    }.forall(identity)
    if (!detOk) throw new UnsupportedOperationException(
      "deleteForeign needs a deterministic predicate: the published " +
        "tombstones must be the rows the caller saw match")
    val live = IcebergRead.liveEntries(spark, targetPath, meta0, None)
    val dataEntries = live.filter(_.content == 0)
    // normalized key → the EXACT path string the manifests record
    // (readers match file_path byte-exact)
    val byKey = dataEntries.map(e => PathKeys.normKey(
      IcebergRead.resolve(targetPath, e.path).toString) -> e.path).toMap
    if (byKey.size != dataEntries.size) throw new IllegalStateException(
      s"two manifest data paths normalize to one key at $targetPath — " +
        "cannot address position deletes unambiguously")
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    import spark.implicits._
    val mapDf = byKey.toSeq.toDF("__g_fp", "__g_file_path")
    val matched = rows.filter(matchedF)
      .select(col("__g_fp"), col("__g_ri").cast("long").as("pos"))
      .join(broadcast(mapDf), Seq("__g_fp"))
      .select(col("__g_file_path").as("file_path"), col("pos"))
      .distinct()
    // staged payloads are final before the OCC loop; only the
    // manifests/list rewrite per attempt (they embed racing ids)
    var delPayload: Either[String, Seq[(String, Seq[Long])]] = null
    var revectored = Set.empty[String] // normKeys whose prior DV supersedes
    var affectedKeys = Set.empty[String] // v3: data files our vectors cover
    if (!v3) {
      // v2: one sorted position-delete parquet with the reserved ids
      val fpMeta = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", 2147483546L).build()
      val posMeta = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", 2147483545L).build()
      val stage = s"$targetPath/deletes/.stage-pd-$uuid"
      matched
        .select(col("file_path").as("file_path", fpMeta),
          col("pos").as("pos", posMeta))
        .coalesce(1).sortWithinPartitions("file_path", "pos")
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("delete stage wrote no part"))
      val dst = new java.io.File(s"$targetPath/deletes/pdf-$uuid.parquet")
      dst.getParentFile.mkdirs()
      val empty = spark.read.parquet(part.getAbsolutePath).isEmpty
      java.nio.file.Files.move(part.toPath, dst.toPath)
      def deleteRec(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(): Unit
      }
      deleteRec(new java.io.File(stage))
      if (empty) { dst.delete(); return curId } // zero matches: no commit
      delPayload = Left(dst.getAbsolutePath)
    } else {
      // v3: deletion vectors, one per affected file — CUMULATIVE: a
      // file that already carries a DV gets ONE superseding vector
      // holding old ∪ new positions (the at-most-one-DV rule), and its
      // prior entry is dropped from the carried-forward manifests below
      val newByFile = matched.collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (p, ps) => (p, ps.map(_._2).toSeq.sorted) }
      if (newByFile.isEmpty) return curId
      val existingByRef: Map[String, Seq[Long]] =
        live.filter(e => e.content == 1 && e.dv.nonEmpty)
          .groupBy(e => PathKeys.normKey(
            IcebergRead.resolve(targetPath, e.dv.get._1).toString))
          .map { case (k, es) =>
            k -> es.flatMap { e =>
              val (_, off, len) = e.dv.get
              Puffin.dvPositions(spark,
                IcebergRead.resolve(targetPath, e.path).toString, off, len)
            }.toSeq
          }
      val byFile = newByFile.map { case (p, ps) =>
        val k = PathKeys.normKey(IcebergRead.resolve(targetPath, p).toString)
        if (existingByRef.contains(k)) revectored += k
        (p, (ps ++ existingByRef.getOrElse(k, Nil)).distinct.sorted)
      }
      affectedKeys = byFile.map(f => PathKeys.normKey(
        IcebergRead.resolve(targetPath, f._1).toString)).toSet
      delPayload = Right(byFile)
    }
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      val (baseV, meta) = if (attempt == 0) (v0, meta0) else foreignBase(targetPath)
      if (attempt > 0 &&
          (fieldsOfMeta(meta) != fields || partColsOfMeta(meta, fields) != partCols))
        throw new IllegalStateException(
          s"concurrent schema or spec change at $targetPath moved the table " +
            "under this delete; re-read and retry explicitly", lastErr)
      if (attempt > 0 && affectedKeys.nonEmpty) {
        // a racing commit that vectored one of OUR files would be
        // resurrected by our (now stale) cumulative vector — loud
        def dvStateOf(l: Seq[IcebergRead.EntryInfo]) =
          l.filter(e => e.content == 1 && e.dv.nonEmpty)
            .map(e => (PathKeys.normKey(IcebergRead
              .resolve(targetPath, e.dv.get._1).toString), e.path, e.dv.get))
            .filter(t => affectedKeys(t._1)).toSet
        if (dvStateOf(IcebergRead.liveEntries(spark, targetPath, meta)) !=
            dvStateOf(live))
          throw new IllegalStateException(
            s"concurrent commit at $targetPath re-vectored a file under " +
              "this delete; re-read and re-issue the delete", lastErr)
      }
      val snaps = snapsOfMeta(meta)
      val seqNum = math.max(
        Option(meta.get("last-sequence-number")).map(_.asLong()).getOrElse(0L),
        snaps.map(_.seqNum).foldLeft(0L)(math.max)) + 1
      val taken = snaps.map(_.id).toSet
      var snapId = (1L << 40) | seqNum
      while (taken(snapId)) snapId += 1
      val rowBase = Option(meta.get("next-row-id")).map(_.asLong())
      val schemaId = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
      val delSpecId =
        if (partCols.isEmpty)
          Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
        else emptySpecIdOf(meta)
      val delFiles = delPayload match {
        case Left(pdPath) => describeFiles(spark, Seq(pdPath))
        case Right(byFile) =>
          // puffin embeds the racing snapshot/sequence ids → per attempt
          val puffinPath = new java.io.File(
            s"$targetPath/deletes/dvf-$uuid-a$attempt.puffin").getAbsolutePath
          val refs = Puffin.writeDvFile(spark, puffinPath, byFile, snapId, seqNum)
          val puffinLen = new java.io.File(puffinPath).length()
          refs.map(r => NewFile(puffinPath, r.cardinality, puffinLen,
            dv = Some((r.referencedDataFile, r.offset, r.length))))
      }
      val mref = writeManifest(targetPath, s"mp-$uuid-a$attempt.avro", snapId,
        seqNum, delFiles, fields, content = 1, partCols = Nil,
        specId = delSpecId, v3 = v3, schemaId = schemaId)
      val cur = Option(meta.get("current-snapshot-id")).map(_.asLong())
        .filter(_ != -1L).flatMap(id => snaps.find(_.id == id))
        .getOrElse(snaps.last)
      val priorRecords = avroRecords(spark,
        IcebergRead.resolve(targetPath, cur.manifestList))
      // v3 supersede: delete manifests holding a prior vector of a
      // re-vectored file are rewritten WITHOUT it (surviving entries
      // as EXISTING), or omitted entirely when emptied — the graft
      // append path's carry-forward rule, applied to a foreign chain
      val extraManifests = Seq.newBuilder[ManifestRef]
      val priorKept = Seq.newBuilder[org.apache.avro.generic.GenericRecord]
      priorRecords.zipWithIndex.foreach { case (rec, i) =>
        val content = Option(rec.get("content"))
          .map(_.asInstanceOf[Number].intValue()).getOrElse(0)
        if (revectored.isEmpty || content == 0) priorKept += rec
        else {
          val mPath = IcebergRead.resolve(targetPath,
            String.valueOf(rec.get("manifest_path")))
          val entries = avroRecords(spark, mPath)
          val (dropped, kept) = entries.partition { e =>
            val df = e.get("data_file").asInstanceOf[
              org.apache.avro.generic.GenericRecord]
            Option(if (df.getSchema.getField("referenced_data_file") == null)
              null else df.get("referenced_data_file"))
              .exists(r => revectored(PathKeys.normKey(IcebergRead
                .resolve(targetPath, String.valueOf(r)).toString)))
          }
          if (dropped.isEmpty) priorKept += rec
          else if (kept.nonEmpty)
            extraManifests += writeExistingDeleteManifest(targetPath,
              s"mp-$uuid-a$attempt-c$i.avro", kept, fields,
              Option(rec.get("partition_spec_id"))
                .map(_.asInstanceOf[Number].intValue()).getOrElse(0))
        }
      }
      val ml = writeManifestList(targetPath, s"snap-pd-$uuid-a$attempt.avro",
        snapId, seqNum, priorKept.result(),
        Seq(mref) ++ extraManifests.result(), v3 = v3)
      try {
        commitForeignMeta(targetPath, meta, baseV + 1, snapId, seqNum, ml,
          "delete",
          firstRowId = if (v3) rowBase else None,
          nextRowId = None,
          ensureEmptySpec = if (partCols.isEmpty) None else Some(delSpecId))
        return snapId
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          lastErr = e
          attempt += 1
      }
    }
    throw new java.io.IOException(
      s"commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }

  /** PREDICATE-based UPDATE of ANY v2/v3 Iceberg table — ONE
    * merge-on-read `overwrite` snapshot holding both halves (r15; the
    * Iceberg face of [[DeltaExport.updateForeign]], completing the
    * foreign DML matrix): matched rows' coordinates publish as
    * position deletes (v2) or superseding deletion vectors (v3,
    * cumulative per the at-most-one-DV rule), and the SAME rows with
    * `sets` applied stage as new data files under the table's real
    * field ids and partition layout — a SET may move a row across
    * partitions; the transform staging re-buckets it correctly. Both
    * manifests commit atomically at one sequence number; readers
    * never see the delete without the re-add.
    *
    * Loud-or-exact: SET expressions must preserve their column's
    * exact type; `required` columns re-validate from the staged
    * footers; nondeterministic predicates or SETs decline (the
    * tombstoned rows and the re-staged rows must be the same rows);
    * v3 assigns the new rows FRESH row ids (the spec permits this —
    * preserving ids through an update is an engine choice this writer
    * does not make silently). Zero matches commit nothing. */
  def updateForeign(spark: SparkSession, targetPath: String,
      predicate: org.apache.spark.sql.Column,
      sets: Map[String, org.apache.spark.sql.Column],
      maxRetries: Int = 3): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, when}
    require(sets.nonEmpty, "updateForeign needs at least one SET column")
    requireLocalScheme(targetPath, "updateForeign")
    val (v0, meta0) = foreignBase(targetPath)
    val fv = Option(meta0.get("format-version")).map(_.asInt()).getOrElse(1)
    if (fv != 2 && fv != 3) throw new UnsupportedOperationException(
      s"iceberg table at $targetPath is format-version $fv; foreign writes " +
        "speak versions 2 and 3")
    val v3 = fv == 3
    val fields = fieldsOfMeta(meta0)
    val partCols = partColsOfMeta(meta0, fields)
    val snaps0 = snapsOfMeta(meta0)
    if (snaps0.isEmpty) throw new IllegalStateException(
      s"no snapshots at $targetPath; export or append a snapshot first")
    if (v3 && !meta0.has("next-row-id")) throw new UnsupportedOperationException(
      s"format-version-3 table at $targetPath carries no next-row-id; " +
        "v3 requires row lineage — cannot assign row ids")
    val curId = Option(meta0.get("current-snapshot-id")).map(_.asLong())
      .filter(_ != -1L).getOrElse(snaps0.last.id)
    val byName = fields.map(t => t._2 -> t).toMap
    sets.keys.foreach(n => if (!byName.contains(n))
      throw new IllegalArgumentException(
        s"SET column $n is not a column of $targetPath"))
    val rows = IcebergRead.readWithPositions(spark, targetPath)
    val matchedF = coalesce(predicate, lit(false))
    // exact-type contract per SET expression (checked on its OWN type)
    sets.foreach { case (n, v) =>
      val got = icebergType(rows.select(v.as("__g_probe")).schema.head.dataType)
      if (got != byName(n)._4) throw new UnsupportedOperationException(
        s"SET of $n produces $got; the column is ${byName(n)._4} — " +
          "cast explicitly")
    }
    val updatedSel = fields.map { case (_, n, _, _) =>
      sets.get(n).map(v => v.as(n)).getOrElse(col(n))
    }
    val detOk = rows.filter(matchedF).select(updatedSel: _*)
      .queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.deterministic
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
          pr.projectList.forall(_.deterministic)
      }.forall(identity)
    if (!detOk) throw new UnsupportedOperationException(
      "updateForeign needs deterministic predicate and SET expressions: " +
        "the tombstoned rows and the re-staged rows must be the same rows")
    val live = IcebergRead.liveEntries(spark, targetPath, meta0, None)
    val dataEntries = live.filter(_.content == 0)
    val byKey = dataEntries.map(e => PathKeys.normKey(
      IcebergRead.resolve(targetPath, e.path).toString) -> e.path).toMap
    if (byKey.size != dataEntries.size) throw new IllegalStateException(
      s"two manifest data paths normalize to one key at $targetPath — " +
        "cannot address position deletes unambiguously")
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    import spark.implicits._
    val mapDf = byKey.toSeq.toDF("__g_fp", "__g_file_path")
    // the matched set is read ONCE, persisted: positions and re-staged
    // rows must come from the same evaluation
    val matchedRows = rows.filter(matchedF)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val coords = matchedRows
        .select(col("__g_fp"), col("__g_ri").cast("long").as("pos"))
        .join(broadcast(mapDf), Seq("__g_fp"))
        .select(col("__g_file_path").as("file_path"), col("pos"))
        .distinct().collect()
        .map(r => (r.getString(0), r.getLong(1)))
      if (coords.isEmpty) return curId
      // delete payload (the deleteForeign shapes)
      var revectored = Set.empty[String]
      var affectedKeys = Set.empty[String]
      var delPayload: Either[String, Seq[(String, Seq[Long])]] = null
      if (!v3) {
        val fpMeta = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2147483546L).build()
        val posMeta = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2147483545L).build()
        val stage = s"$targetPath/deletes/.stage-pd-$uuid"
        coords.toSeq.toDF("file_path", "pos")
          .select(col("file_path").as("file_path", fpMeta),
            col("pos").as("pos", posMeta))
          .coalesce(1).sortWithinPartitions("file_path", "pos")
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException("delete stage wrote no part"))
        val dst = new java.io.File(s"$targetPath/deletes/pdf-$uuid.parquet")
        dst.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, dst.toPath)
        def deleteRec(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(): Unit
        }
        deleteRec(new java.io.File(stage))
        delPayload = Left(dst.getAbsolutePath)
      } else {
        val newByFile = coords.groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (p, ps) => (p, ps.map(_._2).toSeq.sorted) }
        val existingByRef: Map[String, Seq[Long]] =
          live.filter(e => e.content == 1 && e.dv.nonEmpty)
            .groupBy(e => PathKeys.normKey(
              IcebergRead.resolve(targetPath, e.dv.get._1).toString))
            .map { case (k, es) =>
              k -> es.flatMap { e =>
                val (_, off, len) = e.dv.get
                Puffin.dvPositions(spark,
                  IcebergRead.resolve(targetPath, e.path).toString, off, len)
              }.toSeq
            }
        val byFile = newByFile.map { case (p, ps) =>
          val k = PathKeys.normKey(IcebergRead.resolve(targetPath, p).toString)
          if (existingByRef.contains(k)) revectored += k
          (p, (ps ++ existingByRef.getOrElse(k, Nil)).distinct.sorted)
        }
        affectedKeys = byFile.map(f => PathKeys.normKey(
          IcebergRead.resolve(targetPath, f._1).toString)).toSet
        delPayload = Right(byFile)
      }
      // the re-staged half: matched rows with SETs applied, written
      // under the table's real ids and partition layout
      val files = stageForeignData(spark, matchedRows.select(updatedSel: _*),
        targetPath, fields, partCols, uuid)
      val addedRows = files.map(_.recordCount).sum
      var attempt = 0
      var lastErr: Throwable = null
      while (attempt <= maxRetries) {
        val (baseV, meta) = if (attempt == 0) (v0, meta0) else foreignBase(targetPath)
        if (attempt > 0 &&
            (fieldsOfMeta(meta) != fields || partColsOfMeta(meta, fields) != partCols))
          throw new IllegalStateException(
            s"concurrent schema or spec change at $targetPath moved the table " +
              "under this update; re-read and retry explicitly", lastErr)
        if (attempt > 0) {
          // ANY change to the delete state of our affected files — or
          // their removal — makes the staged tombstones stale: loud
          def dvStateOf(l: Seq[IcebergRead.EntryInfo]) =
            l.filter(e => e.content == 1 && e.dv.nonEmpty)
              .map(e => (PathKeys.normKey(IcebergRead
                .resolve(targetPath, e.dv.get._1).toString), e.path, e.dv.get))
              .filter(t => affectedKeys(t._1)).toSet
          val liveNow = IcebergRead.liveEntries(spark, targetPath, meta)
          val dataNow = liveNow.filter(_.content == 0)
            .map(e => PathKeys.normKey(
              IcebergRead.resolve(targetPath, e.path).toString)).toSet
          val touched = coords.map(c => PathKeys.normKey(
            IcebergRead.resolve(targetPath, c._1).toString)).toSet
          if (!touched.subsetOf(dataNow) ||
              (affectedKeys.nonEmpty &&
                dvStateOf(liveNow) != dvStateOf(live)))
            throw new IllegalStateException(
              s"concurrent commit at $targetPath moved a file under this " +
                "update; re-read and re-issue the update", lastErr)
        }
        val snaps = snapsOfMeta(meta)
        val seqNum = math.max(
          Option(meta.get("last-sequence-number")).map(_.asLong()).getOrElse(0L),
          snaps.map(_.seqNum).foldLeft(0L)(math.max)) + 1
        val taken = snaps.map(_.id).toSet
        var snapId = (1L << 42) | seqNum
        while (taken(snapId)) snapId += 1
        val rowBase = Option(meta.get("next-row-id")).map(_.asLong())
        if (v3 && rowBase.isEmpty) throw new IllegalStateException(
          s"concurrent writer dropped next-row-id at $targetPath", lastErr)
        val specId = Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
        val schemaId = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
        val delSpecId =
          if (partCols.isEmpty) specId
          else emptySpecIdOf(meta)
        val delFiles = delPayload match {
          case Left(pdPath) => describeFiles(spark, Seq(pdPath))
          case Right(byFile) =>
            val puffinPath = new java.io.File(
              s"$targetPath/deletes/dvf-$uuid-a$attempt.puffin").getAbsolutePath
            val refs = Puffin.writeDvFile(spark, puffinPath, byFile, snapId, seqNum)
            val puffinLen = new java.io.File(puffinPath).length()
            refs.map(r => NewFile(puffinPath, r.cardinality, puffinLen,
              dv = Some((r.referencedDataFile, r.offset, r.length))))
        }
        val dataMref = writeManifest(targetPath, s"mu-$uuid-a$attempt.avro",
          snapId, seqNum, files, fields, partCols = partCols, specId = specId,
          v3 = v3, firstRowBase = if (v3) rowBase else None, schemaId = schemaId)
        val delMref = writeManifest(targetPath, s"mud-$uuid-a$attempt.avro",
          snapId, seqNum, delFiles, fields, content = 1, partCols = Nil,
          specId = delSpecId, v3 = v3, schemaId = schemaId)
        val cur = Option(meta.get("current-snapshot-id")).map(_.asLong())
          .filter(_ != -1L).flatMap(id => snaps.find(_.id == id))
          .getOrElse(snaps.last)
        val priorRecords = avroRecords(spark,
          IcebergRead.resolve(targetPath, cur.manifestList))
        val extraManifests = Seq.newBuilder[ManifestRef]
        val priorKept = Seq.newBuilder[org.apache.avro.generic.GenericRecord]
        priorRecords.zipWithIndex.foreach { case (rec, i) =>
          val content = Option(rec.get("content"))
            .map(_.asInstanceOf[Number].intValue()).getOrElse(0)
          if (revectored.isEmpty || content == 0) priorKept += rec
          else {
            val mPath = IcebergRead.resolve(targetPath,
              String.valueOf(rec.get("manifest_path")))
            val entries = avroRecords(spark, mPath)
            val (dropped, kept) = entries.partition { e =>
              val df0 = e.get("data_file").asInstanceOf[
                org.apache.avro.generic.GenericRecord]
              Option(if (df0.getSchema.getField("referenced_data_file") == null)
                null else df0.get("referenced_data_file"))
                .exists(r => revectored(PathKeys.normKey(IcebergRead
                  .resolve(targetPath, String.valueOf(r)).toString)))
            }
            if (dropped.isEmpty) priorKept += rec
            else if (kept.nonEmpty)
              extraManifests += writeExistingDeleteManifest(targetPath,
                s"mud-$uuid-a$attempt-c$i.avro", kept, fields,
                Option(rec.get("partition_spec_id"))
                  .map(_.asInstanceOf[Number].intValue()).getOrElse(0))
          }
        }
        val ml = writeManifestList(targetPath, s"snap-up-$uuid-a$attempt.avro",
          snapId, seqNum, priorKept.result(),
          Seq(dataMref, delMref) ++ extraManifests.result(), v3 = v3)
        try {
          commitForeignMeta(targetPath, meta, baseV + 1, snapId, seqNum, ml,
            "overwrite",
            firstRowId = if (v3) rowBase else None,
            nextRowId = if (v3) rowBase.map(_ + addedRows) else None,
            ensureEmptySpec = if (partCols.isEmpty) None else Some(delSpecId))
          return snapId
        } catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            lastErr = e
            attempt += 1
        }
      }
      throw new java.io.IOException(
        s"commit to $targetPath still conflicting after $maxRetries retries",
        lastErr)
    } finally matchedRows.unpersist(): Unit
  }
}
