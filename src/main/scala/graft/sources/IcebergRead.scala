package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Read-only APACHE ICEBERG interop — the second lakehouse format the
  * engine queries IN PLACE (the Delta face is [[DeltaRead]]): replay
  * the public table spec's metadata chain to the current snapshot's
  * live file list and scan it.
  *
  *   - `metadata/version-hint.text` (or the highest
  *     `v*.metadata.json`) names the current table metadata; its
  *     `current-snapshot-id` picks the snapshot, whose
  *     `manifest-list` is an Avro file of manifest descriptors;
  *   - each manifest is an Avro file of `manifest_entry` records:
  *     `status` 0 (EXISTING) / 1 (ADDED) keep the entry's
  *     `data_file`, 2 (DELETED) drops it — BOTH removal shapes
  *     (deleted-status entries and manifests omitted from a newer
  *     snapshot's list) resolve to the same live set;
  *   - Iceberg data files carry ALL columns (partition values are
  *     duplicated into the rows, unlike Delta/Hive layouts), so the
  *     scan is one schema-pinned parquet read of the live files —
  *     pushdown and pruning intact, no value injection;
  *   - the table schema maps from the metadata JSON's field list
  *     (current-schema-id honored); features this reader cannot honor
  *     decline LOUDLY with the feature named: format-version > 2,
  *     non-data content entries (position/equality DELETE FILES), and
  *     field types outside the interchange set.
  *
  * Scale: the metadata chain is driver-side O(manifest entries) —
  * exactly the planning cost Iceberg itself pays; manifests read
  * through avro-core ([[AvroIo]]'s dependency stance: the container
  * format, not the spark-avro module).
  */
object IcebergRead {

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def readText(spark: SparkSession, p: Path): String = {
    val in = fs(spark, p.toString).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      out.toString("UTF-8")
    } finally in.close()
  }

  /** Every record of an Avro container, decoded generically on the
    * driver (manifest metadata is bounded, never row data). */
  private def avroRecords(spark: SparkSession, p: Path): Seq[GenericRecord] = {
    val in = new FsInput(p, spark.sessionState.newHadoopConf())
    val rdr = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (rdr.hasNext) out += rdr.next()
      out.result()
    } finally rdr.close()
  }

  /** Paths inside metadata may be absolute URIs (the spec's usual
    * shape) or table-relative; resolve both. */
  private[sources] def resolve(tablePath: String, p: String): Path = {
    val hp = new Path(p)
    if (hp.isAbsolute || hp.toUri.getScheme != null) hp
    else new Path(s"$tablePath/$p")
  }

  /** The current metadata JSON for the table. */
  private[sources] def currentMetadata(spark: SparkSession, tablePath: String): JsonNode = {
    val metaDir = s"$tablePath/metadata"
    val f = fs(spark, tablePath)
    if (!f.exists(new Path(metaDir)))
      throw new IllegalArgumentException(s"no metadata directory at $tablePath")
    val hint = new Path(metaDir, "version-hint.text")
    val metaFile =
      if (f.exists(hint)) new Path(metaDir, s"v${readText(spark, hint).trim}.metadata.json")
      else {
        val cands = f.listStatus(new Path(metaDir)).toSeq
          .map(_.getPath.getName).filter(_.endsWith(".metadata.json"))
        if (cands.isEmpty) throw new IllegalArgumentException(
          s"no *.metadata.json under $metaDir")
        // the current file is the NUMERICALLY max version: Hadoop-catalog
        // names are unpadded (`v10` sorts before `v9` lexicographically),
        // object-store names lead with a zero-padded sequence — extract
        // the first digit run and compare as numbers, names as tiebreak
        val numbered = cands.map { n =>
          ("""\d+""".r.findFirstIn(n).map(_.toLong).getOrElse(-1L), n)
        }
        new Path(metaDir, numbered.max._2)
      }
    mapper.readTree(readText(spark, metaFile))
  }

  /** Iceberg primitive type name → Spark type (the interchange set;
    * anything else declines loudly). */
  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  private def sparkType(t: String): DataType = t match {
    case "long" => LongType
    case "int" => IntegerType
    case "double" => DoubleType
    case "float" => FloatType
    case "boolean" => BooleanType
    case "string" => StringType
    case "date" => DateType
    case "timestamp" | "timestamptz" => TimestampType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    case other => throw new UnsupportedOperationException(
      s"iceberg field type '$other' is outside this reader's interchange set")
  }

  private[sources] def schemaOf(meta: JsonNode): StructType = {
    val schemaNode = Option(meta.get("schemas")).map { arr =>
      val want = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
      (0 until arr.size()).map(arr.get)
        .find(s => s.get("schema-id").asInt() == want)
        .getOrElse(throw new IllegalStateException(
          s"current-schema-id $want not present in schemas"))
    }.orElse(Option(meta.get("schema"))).getOrElse(
      throw new IllegalStateException("iceberg metadata carries no schema"))
    val fields = schemaNode.get("fields")
    StructType((0 until fields.size()).map { i =>
      val fld = fields.get(i)
      StructField(fld.get("name").asText(),
        sparkType(fld.get("type").asText()),
        nullable = !fld.get("required").asBoolean(false))
    })
  }

  /** The snapshot list in metadata order (the commit order real writers
    * append in): (snapshot-id, resolved manifest-list path). */
  private[sources] def snapshotList(spark: SparkSession, tablePath: String,
      meta: JsonNode): Seq[(Long, Path)] = {
    val fv = Option(meta.get("format-version")).map(_.asInt()).getOrElse(1)
    if (fv > 2) throw new UnsupportedOperationException(
      s"iceberg format-version $fv at $tablePath; this reader supports 1 and 2")
    val snaps = meta.get("snapshots")
    if (snaps == null) Seq.empty
    else (0 until snaps.size()).map { i =>
      val s = snaps.get(i)
      (s.get("snapshot-id").asLong(),
        resolve(tablePath, s.get("manifest-list").asText()))
    }
  }

  /** The manifest paths a snapshot's list names, in list order. */
  private[sources] def manifestsOf(spark: SparkSession, tablePath: String,
      manifestList: Path): Seq[Path] =
    avroRecords(spark, manifestList)
      .map(r => resolve(tablePath, String.valueOf(r.get("manifest_path"))))

  /** One manifest's entries as (status, filePath, content) — content 0
    * is data, 1 position deletes (format v2 merge-on-read, applied at
    * read), 2 equality deletes (declined loudly by callers). */
  private[sources] def entriesOf(spark: SparkSession,
      manifestPath: Path): Seq[(Int, String, Int)] =
    avroRecords(spark, manifestPath).map { e =>
      val status = e.get("status").asInstanceOf[Number].intValue()
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val content = Option(df.get("content"))
        .map(_.asInstanceOf[Number].intValue()).getOrElse(0)
      if (content == 2) throw new UnsupportedOperationException(
        s"iceberg EQUALITY delete file in $manifestPath; this reader applies " +
          "position deletes only — rewrite equality deletes before reading")
      if (content > 2) throw new UnsupportedOperationException(
        s"iceberg content=$content in $manifestPath is outside the v2 spec")
      (status, String.valueOf(df.get("file_path")), content)
    }

  /** A snapshot's live (dataFiles, positionDeleteFiles) — both net of
    * DELETED-status entries (default: the current snapshot).
    *
    * Scope note: position deletes apply to every live data file whose
    * path they name — the common all-in-snapshot case; per-file
    * sequence-number ordering (a delete older than a rewritten data
    * file) is not modeled, and compaction that would need it also
    * removes the delete files. */
  private[sources] def liveFilesSplit(spark: SparkSession, tablePath: String,
      meta: JsonNode, snapshotId: Option[Long] = None): (Seq[String], Seq[String]) = {
    val snapId = snapshotId.orElse(
      Option(meta.get("current-snapshot-id")).map(_.asLong())).getOrElse(
      throw new IllegalStateException(s"no current-snapshot-id at $tablePath"))
    if (snapId == -1) return (Seq.empty, Seq.empty) // empty table sentinel
    val listPath = snapshotList(spark, tablePath, meta)
      .find(_._1 == snapId).map(_._2)
      .getOrElse(throw new IllegalStateException(
        s"snapshot $snapId not in snapshot list at $tablePath"))
    val live = manifestsOf(spark, tablePath, listPath).flatMap { mp =>
      entriesOf(spark, mp).collect {
        case (status, p, content) if status != 2 => (p, content)
      }
    }
    (live.collect { case (p, 0) => p }, live.collect { case (p, 1) => p })
  }

  /** A snapshot's live data files (delete-free tables; callers that
    * can't host merge-on-read use this and fail loudly otherwise). */
  private[sources] def liveFiles(spark: SparkSession, tablePath: String,
      meta: JsonNode, snapshotId: Option[Long] = None): Seq[String] = {
    val (data, dels) = liveFilesSplit(spark, tablePath, meta, snapshotId)
    if (dels.nonEmpty) throw new UnsupportedOperationException(
      s"iceberg snapshot at $tablePath carries position-delete files; " +
        "this path serves data files only — use IcebergRead.read")
    data
  }

  /** SPEC-SHAPED FIXTURE EMITTERS (the `makePdf*` stance: the repo has
    * no Iceberg writer dependency, so demos/specs/queries emit the
    * minimal protocol-faithful artifacts the reader replays — manifest
    * and manifest-list Avro containers plus the metadata JSON; a real
    * Iceberg table carries more fields, which the generic by-name
    * decoding above ignores). */
  object Fixture {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}

    /** entries: (status, absoluteFilePath, content). */
    def manifest(dir: String, name: String,
        entries: Seq[(Int, String, Int)]): String = {
      val dfSchema = SchemaBuilder.record("r102").fields()
        .requiredString("file_path").requiredInt("content").endRecord()
      val entrySchema = SchemaBuilder.record("manifest_entry").fields()
        .requiredInt("status")
        .name("data_file").`type`(dfSchema).noDefault().endRecord()
      val f = new java.io.File(s"$dir/metadata/$name")
      f.getParentFile.mkdirs()
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, f)
      entries.foreach { case (status, path, content) =>
        val dfr = new GenericData.Record(dfSchema)
        dfr.put("file_path", path); dfr.put("content", content)
        val e = new GenericData.Record(entrySchema)
        e.put("status", status); e.put("data_file", dfr)
        w.append(e)
      }
      w.close()
      f.getAbsolutePath
    }

    def manifestList(dir: String, name: String, manifests: Seq[String]): String = {
      val s = SchemaBuilder.record("manifest_file").fields()
        .requiredString("manifest_path").endRecord()
      val f = new java.io.File(s"$dir/metadata/$name")
      f.getParentFile.mkdirs()
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
      w.create(s, f)
      manifests.foreach { m =>
        val r = new GenericData.Record(s); r.put("manifest_path", m); w.append(r)
      }
      w.close()
      f.getAbsolutePath
    }

    /** fields: (id, name, required, icebergType). */
    def metadata(dir: String, v: Int, formatVersion: Int, snapshotId: Long,
        manifestList: String, fields: Seq[(Int, String, Boolean, String)]): Unit =
      metadataMulti(dir, v, formatVersion, snapshotId,
        Seq((snapshotId, manifestList)), fields)

    /** Multi-snapshot variant: `snapshots` in commit order, the
      * current one named by `currentSnapshotId`. */
    def metadataMulti(dir: String, v: Int, formatVersion: Int,
        currentSnapshotId: Long, snapshots: Seq[(Long, String)],
        fields: Seq[(Int, String, Boolean, String)]): Unit = {
      new java.io.File(s"$dir/metadata").mkdirs()
      val fjson = fields.map { case (id, n, req, t) =>
        s"""{"id":$id,"name":"$n","required":$req,"type":"$t"}"""
      }.mkString(",")
      val sjson = snapshots.map { case (id, ml) =>
        s"""{"snapshot-id":$id,"manifest-list":"$ml"}"""
      }.mkString(",")
      val body =
        s"""{"format-version":$formatVersion,"table-uuid":"fixture",
           |"location":"$dir","current-schema-id":0,
           |"schemas":[{"schema-id":0,"type":"struct","fields":[$fjson]}],
           |"current-snapshot-id":$currentSnapshotId,
           |"snapshots":[$sjson]}""".stripMargin
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/metadata/v$v.metadata.json"), body)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"), v.toString)
    }
  }

  /** Canonical file-path form for joining a position-delete file's
    * `file_path` against `_metadata.file_path`: the spec stores full
    * URIs while Spark's metadata column reports Hadoop Path strings
    * (`file:/…` vs `file:///…` vs plain `/…`) — strip the scheme and
    * authority slashes down to one canonical root slash. */
  private def normPath(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_replace(
      c, "^[a-zA-Z][a-zA-Z0-9+.\\-]*:/+", "/")

  /** The table's snapshot as a DataFrame (`snapshotId` pins one; the
    * default is the current snapshot). Format-v2 POSITION DELETES
    * apply merge-on-read: the data scan extends with
    * (`_metadata.file_path`, `_metadata.row_index`) and anti-joins the
    * delete files' (file_path, pos) pairs — O(deleted rows) side,
    * broadcast by AQE when small, the standard MoR read tax. */
  def read(spark: SparkSession, tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val meta = currentMetadata(spark, tablePath)
    val schema = schemaOf(meta)
    val (files, deletes) = liveFilesSplit(spark, tablePath, meta, snapshotId)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val base = spark.read.schema(schema)
      .parquet(files.map(p => resolve(tablePath, p).toString): _*)
    if (deletes.isEmpty) base
    else {
      val withPos = base.select(col("*"),
        normPath(col("_metadata.file_path")).as("__g_fp"),
        col("_metadata.row_index").as("__g_ri"))
      val dels = spark.read
        .parquet(deletes.map(p => resolve(tablePath, p).toString): _*)
        .select(normPath(col("file_path")).as("__g_fp"),
          col("pos").cast("long").as("__g_ri"))
      withPos.join(dels, Seq("__g_fp", "__g_ri"), "left_anti")
        .drop("__g_fp", "__g_ri")
    }
  }
}
