package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** EXPORT a versioned-table snapshot AS a Delta table — the interop
  * direction [[DeltaRead]] doesn't cover: any Delta-speaking engine
  * can then read the graft table's data in place. The export writes
  * ONLY a `_delta_log` (commit 0: protocol + metaData + one `add` per
  * live parquet file, with ABSOLUTE percent-encoded paths — the spec
  * stores paths RFC-2396-encoded and explicitly allows absolute ones,
  * which is what makes this a zero-copy publish); the graft table's
  * immutable data files are never moved or rewritten.
  *
  * [[append]] keeps the published table CURRENT: later graft APPEND
  * commits publish as the next `<v>.json` commits of the same log, so
  * the external table follows the source without re-exporting, and
  * ROW-LEVEL graft commits (deleteMoR/updateMoR) publish as real Delta
  * DELETION VECTORS — the affected adds are re-added carrying a
  * protocol-format DV with their cumulative deleted positions, under a
  * one-time protocol upgrade to reader version 3. Each exported commit
  * records the graft version it mirrors in its `commitInfo`
  * (`graftSourceVersion`), which is what append resumes from.
  * Rewrite/schema-change graft commits cannot be expressed
  * incrementally and decline loudly — re-export a fresh snapshot.
  *
  * Loud-or-exact scope: snapshots with pending deletion vectors export
  * under reader version 3 (`deletionVectors`); RENAMED/DROPPED-era
  * snapshots export as reader-version-2 NAME-MODE column mapping (r14
  * — the logical schema carries per-field physicalName metadata, the
  * shape every Delta engine resolves); a WIDENED era still declines
  * loudly (old files carry narrower physical types the pinned schema
  * would make readers refuse — OPTIMIZE folds them), as does [[append]]
  * over a mapped source (the published metaData is pinned).
  *
  * Scale: O(files) driver work per publish — one manifest read plus
  * one JSON write; no data bytes touched. append is O(new files). */
object DeltaExport {

  /** Absolute file path → the percent-encoded URI string the Delta
    * spec stores (RFC 2396; Hadoop Path.toUri escapes exactly the
    * reserved set). */
  private def encodePath(f: String): String =
    new Path(f).toUri.toASCIIString

  /** [[append]]'s gate only (snapshots export mappings as name mode,
    * r14): the published metaData pins the schemaString, so appending
    * through a source-side mapping change cannot be expressed — a
    * fresh snapshot re-publishes the new mapping. */
  private def requireUnmapped(spark: SparkSession, sourcePath: String, v: Long): Unit =
    if (TimeTravel.colsListing(spark, sourcePath, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"v$v of $sourcePath resolves through a column mapping; append " +
          "cannot follow it under the pinned metaData — export a fresh " +
          "snapshot (which publishes the mapping as name mode)")

  /** TimestampNTZType anywhere in the schema — the protocol requires
    * the `timestampNtz` table feature named for it (r14). */
  private def hasNtz(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampNTZType => true
      case s: StructType => s.fields.exists(f => hasNtz(f.dataType))
      case a: ArrayType => hasNtz(a.elementType)
      case m: MapType => hasNtz(m.keyType) || hasNtz(m.valueType)
      case _ => false
    }
  }

  /** Protocol action sized to what the published table actually needs:
    * plain version 1 readers unless a capability is in play —
    * `deletionVectors` for merge-on-read adds, `timestampNtz` for an
    * NTZ column anywhere in the schema, column MAPPING for renamed-era
    * snapshots (alone it fits the legacy reader-2/writer-5 gate; with
    * any table feature it rides the feature list). */
  /** Widenings an exported table's PLAIN parquet readers promote
    * natively (the Spark vectorized reader's integer upcasts and
    * float→double). int→double / bigint→double are lossless in
    * graft's own branch-per-era read ([[TimeTravel]]) but would make
    * every file-schema reader of the published table fail with a
    * parquet type mismatch — those keep the named export decline. */
  private val ExportableWidenings: Set[(String, String)] = Set(
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"), ("float", "double"))

  private def protocolAction(dv: Boolean, ntz: Boolean,
      cm: Boolean = false, widening: Boolean = false): String =
    if (!dv && !ntz && !cm && !widening)
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    else if (cm && !dv && !ntz && !widening)
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
    else {
      val feats = ((if (dv) Seq("deletionVectors") else Nil) ++
        (if (ntz) Seq("timestampNtz") else Nil) ++
        (if (cm) Seq("columnMapping") else Nil) ++
        (if (widening) Seq("typeWidening") else Nil))
        .map("\"" + _ + "\"").mkString(",")
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":[$feats],"writerFeatures":[$feats]}}"""
    }

  /** Write the protocol-format DV file for (file key, graft version)
    * and return its descriptor JSON fragment. */
  private def dvJson(spark: SparkSession, targetPath: String, tagV: Long,
      key: String, positions: Seq[Long]): String = {
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft-export-dv:$key:$tagV".getBytes(StandardCharsets.UTF_8))
    val d = DeltaDv.writeDvFile(spark, targetPath, uuid, positions)
    s""""deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}",""" +
      s""""offset":${d.offset.get},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
  }

  /** An `add` carrying a deletion vector with `positions`. */
  private def addWithDv(spark: SparkSession,
      conf: org.apache.hadoop.conf.Configuration, targetPath: String,
      tagV: Long, addPath: String, positions: Seq[Long]): String = {
    val p = new Path(addPath)
    val st = p.getFileSystem(conf).getFileStatus(p)
    s"""{"add":{"path":"${encodePath(addPath)}","partitionValues":{},""" +
      s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
      s""""dataChange":true${statsFragment(conf, addPath)},""" +
      s"""${dvJson(spark, targetPath, tagV, normKey(addPath), positions)}}}"""
  }

  /** Scheme-normalized path key: graft DV sidecars record
    * `_metadata.file_path` URIs while the exported log stores
    * `inputFiles` URIs, and the two render the scheme/authority
    * differently (`file:/` vs `file:///`) — match on one canonical
    * root-slash form, the [[IcebergRead]] normalization. */
  private def normKey(p: String): String = PathKeys.normKey(p)

  /** The graft table's deleted positions at `v`, grouped per data file
    * (normalized key → sorted row indexes). Driver-side O(deleted
    * rows) — the MoR boundedness contract ([[TimeTravel.deleteMoR]]'s
    * tombstones fold away at OPTIMIZE, which exports as a rewrite). */
  private def dvPositionsAt(spark: SparkSession, sourcePath: String,
      v: Long): Map[String, Seq[Long]] = {
    val dvs = TimeTravel.dvListing(spark, sourcePath, v)
    if (dvs.isEmpty) Map.empty
    else spark.read.parquet(dvs.map(d => s"$sourcePath/$d"): _*)
      .select(TimeTravel.DvCols.head, TimeTravel.DvCols.last)
      .distinct().collect()
      .map(r => normKey(r.getString(0)) -> r.getLong(1))
      .groupBy(_._1).map { case (f, ps) => f -> ps.map(_._2).toSeq.sorted }
  }

  /** Delta `add.stats` JSON for one parquet file, from its footer:
    * numRecords plus per-top-level-column min/max/nullCount for the
    * JSON-expressible types (longs, ints, doubles, floats, booleans,
    * strings, dates) — the bounds external engines (and
    * [[DeltaRead]]'s own [[FileSkipping]]) plan file skipping with.
    * Row-group statistics merge through parquet's own comparators;
    * columns without usable stats are simply omitted (pruning is an
    * optimization). One footer read per file — the same O(new files)
    * publish cost the Iceberg exporter already pays. */
  private def deltaStatsJson(conf: org.apache.hadoop.conf.Configuration,
      f: String): Option[String] = {
    import scala.jdk.CollectionConverters._
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), conf))
    try {
      val footer = rdr.getFooter
      val msg = footer.getFileMetaData.getSchema
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      }
      val cols = msg.getFields.asScala.filter(_.isPrimitive).flatMap { fld =>
        val name = fld.getName
        val chunks = footer.getBlocks.asScala
          .flatMap(_.getColumns.asScala.filter(_.getPath.toDotString == name))
        val statsL = chunks.map(_.getStatistics)
        if (statsL.isEmpty || statsL.exists(s => s == null || s.isEmpty)) None
        else {
          val merged = statsL.reduceLeft { (a, b) =>
            val m = a.copy(); m.mergeStatistics(b); m
          }
          val nullCount = merged.getNumNulls
          import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
          import org.apache.parquet.schema.LogicalTypeAnnotation
          val prim = fld.asPrimitiveType().getPrimitiveTypeName
          val logical = fld.asPrimitiveType().getLogicalTypeAnnotation
          def jsonOf(v: Any): Option[String] = (prim, logical) match {
            case (INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
              Some("\"" + java.time.LocalDate
                .ofEpochDay(v.asInstanceOf[Number].longValue()) + "\"")
            case (INT64, ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
              // Delta stats carry timestamps as ISO-8601 strings, not
              // raw micros: instant form (Z) for adjusted columns,
              // local form for NTZ. NANOS would need direction-aware
              // rounding (flooring a MAX under-bounds it) — omit.
              import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
              val micros = ts.getUnit match {
                case TimeUnit.MICROS => Some(v.asInstanceOf[Number].longValue())
                case TimeUnit.MILLIS =>
                  Some(Math.multiplyExact(v.asInstanceOf[Number].longValue(), 1000L))
                case _ => None
              }
              micros.map { us =>
                val inst = java.time.Instant.EPOCH
                  .plus(us, java.time.temporal.ChronoUnit.MICROS)
                if (ts.isAdjustedToUTC) "\"" + inst + "\""
                else "\"" + java.time.LocalDateTime
                  .ofInstant(inst, java.time.ZoneOffset.UTC) + "\""
              }
            case (INT32 | INT64, _) => Some(String.valueOf(v))
            case (DOUBLE | FLOAT, _) =>
              val d = v.asInstanceOf[Number].doubleValue()
              if (d.isNaN || d.isInfinite) None else Some(String.valueOf(v))
            case (BOOLEAN, _) => Some(String.valueOf(v))
            case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
              Some("\"" + esc(v.asInstanceOf[org.apache.parquet.io.api.Binary]
                .toStringUsingUTF8) + "\"")
            case _ => None
          }
          val mm =
            if (!merged.hasNonNullValue) None
            else for {
              lo <- jsonOf(merged.genericGetMin)
              hi <- jsonOf(merged.genericGetMax)
            } yield (lo, hi)
          Some((name, mm, nullCount))
        }
      }
      val minJ = cols.collect { case (n, Some((lo, _)), _) => s""""${esc(n)}":$lo""" }
      val maxJ = cols.collect { case (n, Some((_, hi)), _) => s""""${esc(n)}":$hi""" }
      val nullJ = cols.map { case (n, _, nc) => s""""${esc(n)}":$nc""" }
      Some(s"""{"numRecords":${rdr.getRecordCount}""" +
        s""","minValues":{${minJ.mkString(",")}}""" +
        s""","maxValues":{${maxJ.mkString(",")}}""" +
        s""","nullCount":{${nullJ.mkString(",")}}}""")
    } catch { case _: Exception => None } finally rdr.close()
  }

  /** `stats` fragment for embedding in an `add` action (the stats JSON
    * rides as a JSON-encoded STRING per the protocol). */
  private def statsFragment(conf: org.apache.hadoop.conf.Configuration,
      f: String): String =
    deltaStatsJson(conf, f).map { s =>
      s""","stats":"${s.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.getOrElse("")

  private def addAction(conf: org.apache.hadoop.conf.Configuration, f: String): String = {
    val p = new Path(f)
    val st = p.getFileSystem(conf).getFileStatus(p)
    s"""{"add":{"path":"${encodePath(f)}","partitionValues":{},"size":${st.getLen},""" +
      s""""modificationTime":${st.getModificationTime},"dataChange":true""" +
      s"""${statsFragment(conf, f)}}}"""
  }

  private def commitInfo(graftVersion: Long): String =
    s"""{"commitInfo":{"operation":"graft-export","graftSourceVersion":$graftVersion}}"""

  /** The protocol's idempotent-writer marker (SetTransaction): rides in
    * every exported commit AND survives into checkpoints, so the graft
    * watermark outlives vacuumed commit JSONs. */
  private def txnAction(graftVersion: Long): String =
    s"""{"txn":{"appId":"graft-export","version":$graftVersion,"lastUpdated":0}}"""

  private def writeCommit(spark: SparkSession, targetPath: String,
      deltaV: Long, actions: Seq[String]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val logDir = new Path(s"$targetPath/_delta_log")
    val fs = logDir.getFileSystem(conf)
    fs.mkdirs(logDir)
    val target = new Path(logDir, f"$deltaV%020d.json")
    if (fs.exists(target)) throw new IllegalStateException(
      s"$targetPath already carries Delta commit $deltaV; " +
        (if (deltaV == 0) "export to a fresh path" else "concurrent export — retry"))
    val out = fs.create(target, false)
    try out.write(actions.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write `_delta_log` at `targetPath` exposing `sourcePath`@`version`
    * (default latest). A snapshot with pending merge-on-read tombstones
    * exports directly: its adds carry protocol-format DELETION VECTORS
    * and commit 0 declares reader version 3 — the same loud-or-exact
    * semantics, no pre-export OPTIMIZE required. Returns the number of
    * data files published. */
  def snapshot(spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None): Int = {
    import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructField, StructType}
    val v = version.getOrElse(TimeTravel.versions(spark, sourcePath).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no versions at $sourcePath")))
    val colsOpt = TimeTravel.colsListing(spark, sourcePath, v)
    val dirs = TimeTravel.listing(spark, sourcePath, v)
    val scan = spark.read.parquet(dirs.map(d => s"$sourcePath/$d"): _*)
    // a RENAMED/DROPPED-era snapshot exports as NAME-MODE column
    // mapping (r14 — r13 verdict #3): the logical schema carries each
    // field's physicalName, exactly the shape [[DeltaRead.colMapOf]]
    // (and every Delta engine) resolves. A WIDENED era publishes the
    // `typeWidening` feature + the spec's per-field type-change
    // history (r15 — r14 verdict #3): old files keep their narrower
    // physical types and widening-capable readers promote on scan —
    // reads already serve this shape, so declining the export was the
    // last asymmetry. A physical type that is NOT a lossless widening
    // of the declared one keeps the named decline.
    val (logicalSchema, cmConfig, widened) = colsOpt match {
      case None => (scan.schema, "", false)
      case Some(mapping) =>
        // logical → the narrower physical era types observed on disk
        val typeChanges = scala.collection.mutable.Map.empty[String, Set[DataType]]
        dirs.foreach { d =>
          val sch = spark.read.parquet(s"$sourcePath/$d").schema
          mapping.foreach { c =>
            val declared = DataType.fromDDL(c.typeDdl)
            sch.find(_.name == c.physical).foreach { f =>
              if (f.dataType != declared) {
                if (!ExportableWidenings(
                    (f.dataType.catalogString, c.typeDdl)))
                  throw new UnsupportedOperationException(
                    s"snapshot v$v of $sourcePath declares ${c.logical} as " +
                      s"${c.typeDdl} but $d carries ${f.dataType.catalogString}" +
                      " — not a widening plain-parquet readers promote; run " +
                      "TimeTravel.optimize, then export the folded version")
                typeChanges(c.logical) =
                  typeChanges.getOrElse(c.logical, Set.empty) + f.dataType
              }
            }
          }
        }
        val fields = mapping.zipWithIndex.map { case (c, i) =>
          val declared = DataType.fromDDL(c.typeDdl)
          val mb = new MetadataBuilder()
            .putLong("delta.columnMapping.id", i + 1L)
            .putString("delta.columnMapping.physicalName", c.physical)
          typeChanges.get(c.logical).foreach { froms =>
            // the protocol's field-level history: one entry per
            // narrower era, in the spec's type-name vocabulary
            // ("integer"/"long"/…, not Spark DDL)
            mb.putMetadataArray("delta.typeChanges",
              froms.toSeq.sortBy(_.typeName).map(from =>
                new MetadataBuilder()
                  .putString("fromType", from.typeName)
                  .putString("toType", declared.typeName)
                  .build()).toArray)
          }
          StructField(c.logical, declared, nullable = true, mb.build())
        }
        (StructType(fields.toArray),
          s""""delta.columnMapping.mode":"name"""" +
            s""","delta.columnMapping.maxColumnId":"${mapping.size}"""",
          typeChanges.nonEmpty)
    }
    val schemaJson = logicalSchema.json
    val files = scan.inputFiles.sorted
    val conf = spark.sessionState.newHadoopConf()
    val esc = schemaJson.replace("\\", "\\\\").replace("\"", "\\\"")
    val dvs = dvPositionsAt(spark, sourcePath, v)
    val fileKeys = files.map(normKey).toSet
    dvs.keys.find(!fileKeys(_)).foreach { k =>
      throw new IllegalStateException(
        s"tombstones at v$v reference $k, which the snapshot's listing " +
          "does not contain — corrupt deletion-vector state")
    }
    val actions = Seq.newBuilder[String]
    actions += commitInfo(v)
    actions += txnAction(v)
    actions += protocolAction(dv = dvs.nonEmpty, ntz = hasNtz(logicalSchema),
      cm = colsOpt.nonEmpty, widening = widened)
    actions +=
      (s"""{"metaData":{"id":"graft-export","format":""" +
        s"""{"provider":"parquet","options":{}},"schemaString":"$esc",""" +
        s""""partitionColumns":[],"configuration":{$cmConfig}}}""")
    files.foreach { f =>
      dvs.get(normKey(f)) match {
        case Some(positions) =>
          actions += addWithDv(spark, conf, targetPath, v, f, positions)
        case None => actions += addAction(conf, f)
      }
    }
    writeCommit(spark, targetPath, 0L, actions.result())
    files.length
  }

  /** The last graft version the exported log at `targetPath` mirrors
    * (max `commitInfo.graftSourceVersion` across its commits). */
  private[sources] def exportedSourceVersion(spark: SparkSession,
      targetPath: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val logDir = new Path(s"$targetPath/_delta_log")
    val fs = logDir.getFileSystem(conf)
    if (!fs.exists(logDir)) throw new IllegalArgumentException(
      s"no _delta_log at $targetPath; run DeltaExport.snapshot first")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val versions = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong).sorted
    val marks = versions.flatMap { v =>
      val in = fs.open(new Path(logDir, f"$v%020d.json"))
      val body = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        out.toString("UTF-8")
      } finally in.close()
      body.split('\n').map(_.trim).filter(_.nonEmpty).flatMap { line =>
        val node = mapper.readTree(line)
        Option(node.get("commitInfo")).flatMap(ci =>
          Option(ci.get("graftSourceVersion")).map(_.asLong())) orElse
          Option(node.get("txn")).filter(t =>
            t.get("appId").asText() == "graft-export")
            .map(_.get("version").asLong())
      }
    }
    // vacuumed logs: the watermark survives in the checkpoint's txn row
    val cpMarks: Seq[Long] = {
      val lc = new Path(logDir, "_last_checkpoint")
      if (!fs.exists(lc)) Seq.empty
      else {
        val in = fs.open(lc)
        val body = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          out.toString("UTF-8")
        } finally in.close()
        val cpV = mapper.readTree(body).get("version").asLong()
        val cpFile = new Path(logDir, f"$cpV%020d.checkpoint.parquet")
        if (!fs.exists(cpFile)) Seq.empty
        else {
          val df = spark.read.parquet(cpFile.toString)
          if (!df.columns.contains("txn")) Seq.empty
          else df.select("txn.appId", "txn.version").na.drop(Seq("appId"))
            .collect().toSeq
            .filter(_.getString(0) == "graft-export").map(_.getLong(1))
        }
      }
    }
    (marks ++ cpMarks).maxOption.getOrElse(throw new IllegalStateException(
      s"the Delta log at $targetPath was not produced by DeltaExport " +
        "(no graftSourceVersion marker); append only follows graft exports"))
  }

  /** APPEND the graft commits since the last export as new Delta
    * commits of the already-published log — the write-back face that
    * keeps an external table current. Intervening APPEND commits
    * publish as plain adds; ROW-LEVEL commits (deleteMoR/updateMoR
    * tombstones) publish as real Delta DELETION VECTORS — the affected
    * files are re-added with a protocol-format DV ([[DeltaDv]]'s
    * z85/RoaringBitmap binary) carrying their cumulative deleted
    * positions, under a one-time in-log protocol upgrade to reader
    * version 3 / `deletionVectors`. Rewrite / schema-change commits
    * still decline loudly (re-export a fresh snapshot). Returns the
    * number of data files appended or re-added (0 = already current).
    *
    * Scale: O(new files) adds + O(deleted rows) DV bytes per publish;
    * no data bytes move. */
  def append(spark: SparkSession, sourcePath: String, targetPath: String,
      toVersion: Option[Long] = None): Int = {
    val g0 = exportedSourceVersion(spark, targetPath)
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
    val conf = spark.sessionState.newHadoopConf()
    val exported = DeltaRead.replay(spark, targetPath)
    // the files this call adds (an updateMoR in the window may ALSO
    // tombstone rows of a file added here — its add must carry the DV
    // directly, there is no prior add to remove)
    val newFiles: Seq[String] =
      if (newDirs.isEmpty) Seq.empty
      else {
        val scan = spark.read.parquet(newDirs.map(d => s"$sourcePath/$d"): _*)
        // the published metaData pins the schema; new files must match it
        if (exported.schemaJson.exists(_ != scan.schema.json))
          throw new UnsupportedOperationException(
            s"graft commits after v$g0 changed the data schema at $sourcePath; " +
              "the published Delta metaData is pinned — re-export a fresh snapshot")
        scan.inputFiles.sorted.toSeq
      }
    // cumulative per-file deleted positions on each side of the window;
    // graft tombstones only ever accumulate between optimizes (an
    // optimize classifies Rewrite and never reaches here): growth is
    // the expected shape, a LOST position is corrupt state
    val dv0 = if (rowLevel) dvPositionsAt(spark, sourcePath, g0) else Map.empty[String, Seq[Long]]
    val dv1 = if (rowLevel) dvPositionsAt(spark, sourcePath, g1) else Map.empty[String, Seq[Long]]
    dv0.foreach { case (f, ps0) =>
      val ps1 = dv1.getOrElse(f, Seq.empty).toSet
      if (!ps0.forall(ps1)) throw new IllegalStateException(
        s"deleted positions for $f shrank between v$g0 and v$g1 without a " +
          "rewrite commit — corrupt deletion-vector state")
    }
    val changed = dv1.filter { case (f, ps) => dv0.getOrElse(f, Seq.empty) != ps }
    val actions = Seq.newBuilder[String]
    actions += commitInfo(g1)
    actions += txnAction(g1)
    // first DVs on this log: upgrade the protocol, PRESERVING an
    // already-declared timestampNtz feature (protocol actions replace,
    // they don't merge)
    if (changed.nonEmpty && (exported.minReader < 3 ||
        !exported.readerFeatures.contains("deletionVectors")))
      actions += protocolAction(dv = true,
        ntz = exported.schemaJson.exists(j => hasNtz(
          org.apache.spark.sql.types.DataType.fromJson(j))))
    var published = 0
    newFiles.foreach { f =>
      changed.get(normKey(f)) match {
        case Some(positions) =>
          actions += addWithDv(spark, conf, targetPath, g1, f, positions)
        case None => actions += addAction(conf, f)
      }
      published += 1
    }
    // DV'd files the exported log already carries: remove + re-add with
    // the cumulative vector (a Delta DV is complete per file, never a
    // delta of a delta)
    val newKeys = newFiles.map(normKey).toSet
    val exportedByKey = exported.adds.keys.map(p => normKey(p) -> p).toMap
    changed.toSeq.filterNot(c => newKeys(c._1)).sortBy(_._1)
      .foreach { case (key, positions) =>
        val addPath = exportedByKey.getOrElse(key,
          throw new IllegalStateException(
            s"graft tombstones reference $key, which the exported log at " +
              s"$targetPath never added — re-export a fresh snapshot"))
        val p = new Path(addPath)
        val st = p.getFileSystem(conf).getFileStatus(p)
        actions += (s"""{"remove":{"path":"${encodePath(addPath)}",""" +
          s""""deletionTimestamp":${st.getModificationTime},"dataChange":true}}""")
        actions += addWithDv(spark, conf, targetPath, g1, addPath, positions)
        published += 1
      }
    val deltaV = nextDeltaVersion(spark, targetPath)
    writeCommit(spark, targetPath, deltaV, actions.result())
    if (deltaV > 0 && deltaV % CheckpointInterval == 0)
      writeCheckpoint(spark, targetPath, deltaV, g1)
    published
  }

  /** The next commit number: past the max commit JSON AND past any
    * checkpoint (whose pre-checkpoint JSONs may have been vacuumed). */
  private def nextDeltaVersion(spark: SparkSession, targetPath: String): Long = {
    val logDir = new Path(s"$targetPath/_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
    val fromJson = names
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong)
    // classic single/multi-part AND v2 UUID-named checkpoints all lead
    // with the zero-padded version — parse up to the first dot
    val fromCp = names
      .filter(_.contains(".checkpoint"))
      .flatMap { n =>
        val d = n.takeWhile(_ != '.')
        if (d.nonEmpty && d.forall(_.isDigit)) Some(d.toLong) else None
      }
    (fromJson ++ fromCp).maxOption.map(_ + 1).getOrElse(0L)
  }

  /** Classic single-part CHECKPOINT every N commits of the exported
    * log (the protocol's replay acceleration): the net state lands as
    * `<v>.checkpoint.parquet` action columns + `_last_checkpoint`, so
    * readers replay O(since-checkpoint) commits instead of the whole
    * log, and pre-checkpoint commit JSONs become vacuum-able without
    * losing the table. Driver-side O(live files). */
  private[sources] def writeCheckpoint(spark: SparkSession, targetPath: String,
      deltaV: Long, graftV: Long): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val st = DeltaRead.replay(spark, targetPath, Some(deltaV))
    val conf = spark.sessionState.newHadoopConf()
    // adds carry their deletion vector (a DV'd file re-added by a
    // row-level append must keep it through checkpoint replay, or a
    // from-checkpoint reader silently over-serves deleted rows)
    val dvT = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", LongType), StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val addT = StructType(Seq(
      StructField("path", StringType), StructField("partitionValues",
        MapType(StringType, StringType)),
      StructField("size", LongType), StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", dvT),
      StructField("stats", StringType)))
    // metaData.format is REQUIRED by the protocol: once pre-checkpoint
    // commit JSONs are vacuumed, external readers reconstruct metaData
    // from the checkpoint alone and some require format.provider
    val formatT = StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))
    val metaT = StructType(Seq(
      StructField("id", StringType), StructField("format", formatT),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val protoT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))
    val txnT = StructType(Seq(
      StructField("appId", StringType), StructField("version", LongType)))
    val schema = StructType(Seq(StructField("add", addT),
      StructField("metaData", metaT), StructField("protocol", protoT),
      StructField("txn", txnT)))
    val feats =
      if (st.readerFeatures.isEmpty) null else st.readerFeatures.toSeq.sorted
    val rows = Seq(
      Row(null, null,
        Row(st.minReader, if (feats == null) 2 else 7, feats, feats), null),
      Row(null, Row("graft-export", Row("parquet", Map.empty[String, String]),
        st.schemaJson.orNull, st.partitionCols, st.config), null, null),
      Row(null, null, null, Row("graft-export", graftV))) ++
      st.adds.values.toSeq.sortBy(_.path).map { a =>
        val p = new Path(a.path)
        val fst = p.getFileSystem(conf).getFileStatus(p)
        val dvRow = a.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
          d.offset.map(Long.box).orNull, d.sizeInBytes, d.cardinality)).orNull
        Row(Row(encodePath(a.path), a.partitionValues, fst.getLen,
          fst.getModificationTime, true, dvRow, a.stats.orNull), null, null, null)
      }
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    // the protocol names ONE file: stage the parquet, move the part
    val logDir = new Path(s"$targetPath/_delta_log")
    val stage = new Path(logDir, f".cp-$deltaV%020d.staging")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val fs = logDir.getFileSystem(conf)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("checkpoint stage wrote no part"))
    val target = new Path(logDir, f"$deltaV%020d.checkpoint.parquet")
    if (!fs.rename(part, target)) throw new java.io.IOException(
      s"checkpoint publish failed for $target")
    fs.delete(stage, true)
    val lc = new Path(logDir, "_last_checkpoint")
    val out = fs.create(lc, true)
    try out.write(s"""{"version":$deltaV,"size":${rows.size}}"""
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Commit interval between export checkpoints. */
  private[sources] val CheckpointInterval = 10L

  // ------------------------------------------------- foreign append

  /** Writer features a blind APPEND can honor. Features whose
    * obligations an append could VIOLATE gate on presence in
    * [[requireForeignAppendable]] (constraints, invariants,
    * generated/identity columns); the rest are inert for pure adds —
    * `changeDataFeed` included: inserts need no cdc action, readers
    * synthesize them from the adds. Anything outside this set
    * (rowTracking's per-add base ids, icebergCompat's field-id files,
    * …) declines BY NAME. */
  private val AppendableWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "generatedColumns",
    "changeDataFeed", "columnMapping", "timestampNtz", "deletionVectors",
    "v2Checkpoint", "domainMetadata")

  private def requireForeignAppendable(tablePath: String,
      st: DeltaRead.LogState,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    if (st.minWriter > 7) throw new UnsupportedOperationException(
      s"delta table at $tablePath requires minWriterVersion ${st.minWriter}; " +
        "this writer speaks versions 1-7")
    if (st.minWriter >= 7) {
      val unsupported = st.writerFeatures -- AppendableWriterFeatures
      if (unsupported.nonEmpty) throw new UnsupportedOperationException(
        s"delta table at $tablePath requires writer feature(s) " +
          s"${unsupported.toSeq.sorted.mkString(", ")}; appendForeign " +
          s"honors ${AppendableWriterFeatures.toSeq.sorted.mkString(", ")} only")
    }
    // obligations a blind append cannot ENFORCE decline on presence —
    // committing rows past a CHECK constraint would corrupt the
    // table's contract even though the bytes are well-formed
    val constraints = st.config.keys.filter(_.startsWith("delta.constraints."))
    if (constraints.nonEmpty) throw new UnsupportedOperationException(
      s"delta table at $tablePath declares CHECK constraint(s) " +
        s"${constraints.toSeq.sorted.mkString(", ")}; appendForeign cannot " +
        "validate them — append through an engine that can")
    schema.fields.foreach { f =>
      if (f.metadata.contains("delta.invariants"))
        throw new UnsupportedOperationException(
          s"column ${f.name} of $tablePath carries an invariant; " +
            "appendForeign cannot validate it")
      if (f.metadata.contains("delta.generationExpression"))
        throw new UnsupportedOperationException(
          s"column ${f.name} of $tablePath is a generated column; " +
            "appendForeign cannot guarantee the generation expression")
      if (f.metadata.json.contains("delta.identity."))
        throw new UnsupportedOperationException(
          s"column ${f.name} of $tablePath is an identity column; " +
            "appendForeign cannot allocate its values")
    }
  }

  /** Physical write shape of one logical type: nested fields renamed
    * to their `physicalName`s, and — in id mode (r15, r14 verdict #7)
    * — every field additionally tagged `parquet.field.id` from its
    * `delta.columnMapping.id`, so the staged parquet binds by FIELD ID
    * the way id-mode readers resolve. Casting to this type carries the
    * nested metadata into the written schema. */
  private def physicalWriteType(dt: org.apache.spark.sql.types.DataType,
      withIds: Boolean): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case st: StructType => StructType(st.fields.map { f =>
        val phys =
          if (f.metadata.contains("delta.columnMapping.physicalName"))
            f.metadata.getString("delta.columnMapping.physicalName")
          else f.name
        val mb = new MetadataBuilder()
        if (withIds && f.metadata.contains("delta.columnMapping.id"))
          mb.putLong("parquet.field.id",
            f.metadata.getLong("delta.columnMapping.id"))
        StructField(phys, physicalWriteType(f.dataType, withIds),
          f.nullable, mb.build())
      })
      case at: ArrayType =>
        at.copy(elementType = physicalWriteType(at.elementType, withIds))
      case mt: MapType =>
        mt.copy(keyType = physicalWriteType(mt.keyType, withIds),
          valueType = physicalWriteType(mt.valueType, withIds))
      case other => other
    }
  }

  /** Sum of footer null counts for `cols` across every parquet part
    * under `dir` (recursive), keyed by column name; None when some
    * row-bearing file lacks statistics for the column. NOT NULL /
    * `required` writer obligations validate from the STAGED footers —
    * already written, so no persist and no second pass over the frame
    * (r15 review: the aggregate-prepass doubled write I/O). */
  private[sources] def stagedNullCounts(
      conf: org.apache.hadoop.conf.Configuration, dir: Path,
      cols: Seq[String]): Map[String, Option[Long]] = {
    import scala.jdk.CollectionConverters._
    val fs = dir.getFileSystem(conf)
    val parts = Seq.newBuilder[Path]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet"))
        parts += s.getPath
    }
    val acc = scala.collection.mutable.Map[String, Option[Long]](
      cols.map(_ -> (Some(0L): Option[Long])): _*)
    parts.result().foreach { p =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        if (rdr.getRecordCount > 0) {
          val footer = rdr.getFooter
          cols.foreach { c =>
            val chunks = footer.getBlocks.asScala.flatMap(_.getColumns.asScala
              .filter(_.getPath.toDotString == c))
            val stats = chunks.map(_.getStatistics)
            val n: Option[Long] =
              if (chunks.isEmpty || stats.exists(s => s == null || !s.isNumNullsSet))
                None
              else Some(stats.map(_.getNumNulls).sum)
            acc(c) = for { a <- acc(c); b <- n } yield a + b
          }
        }
      } finally rdr.close()
    }
    acc.toMap
  }

  /** NOT NULL is a writer obligation the spec requires every appender
    * to enforce. Top-level non-nullable columns are validated from the
    * staged footers ([[appendForeign]]); non-nullable fields NESTED
    * under structs/arrays/maps cannot be validated that cheaply, so
    * their presence declines by name — same stance as invariants. */
  private def nestedNonNullable(dt: org.apache.spark.sql.types.DataType)
      : Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType =>
        s.fields.exists(f => !f.nullable || nestedNonNullable(f.dataType))
      case a: ArrayType => !a.containsNull || nestedNonNullable(a.elementType)
      case m: MapType =>
        !m.valueContainsNull || nestedNonNullable(m.keyType) ||
          nestedNonNullable(m.valueType)
      case _ => false
    }
  }

  /** Structural schema equality: names + types, nullability and
    * metadata ignored (metadata carries mapping/statistics hints the
    * caller's frame legitimately lacks). */
  private def normType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, normType(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(normType(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(normType(m.keyType), normType(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  /** The protocol's partition-value STRING form for the identity
    * types appendForeign serves. */
  private def partitionValueString(v: Any,
      dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    if (v == null) null
    else dt match {
      case StringType | IntegerType | LongType | ShortType | ByteType |
          BooleanType | DateType => v.toString
      case other => throw new UnsupportedOperationException(
        s"partition column type $other is outside appendForeign's " +
          "identity set (string, integral, boolean, date)")
    }
  }

  /** APPEND `df` into ANY Delta table — including tables this engine
    * did not create (r13 verdict #2, the largest remaining interop
    * write gap): stage the rows as new parquet files inside the table
    * root, then publish ONE commit JSON whose adds carry the log-borne
    * partition values and footer stats, under the protocol's
    * put-if-absent commit rule with bounded OCC retry.
    *
    * Loud-or-exact scope ([[requireForeignAppendable]]): the table's
    * writer requirements must be in this writer's vocabulary; CHECK
    * constraints / invariants / generated / identity columns decline
    * on PRESENCE (an appender that cannot validate them must not
    * commit past them); name-mode column mapping writes the physical
    * names (nested included), id mode declines by name. `df`'s schema
    * must equal the table's logical schema (names + types).
    *
    * CONCURRENCY: a pure-add commit conflicts only with concurrent
    * `metaData`/`protocol` changes — on a version race the retry
    * re-replays the log, re-validates schema and protocol, and
    * re-commits the SAME already-written files at the next number (the
    * standard Delta OCC shape). A concurrent schema change fails
    * loudly. On failure the staged files are unreachable (never
    * logged), the same garbage class every Delta writer leaves.
    *
    * Scale: one distributed write of `df` + O(new files) driver work;
    * the conflict window is one JSON rename, independent of data
    * size. Returns the committed version. */
  def appendForeign(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, targetPath: String,
      maxRetries: Int = 3): Long = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
    // version-ANCHORED base state (the deleteForeign stance): list
    // first, replay capped at that version, and have the OCC loop
    // re-validate whenever the commit target moves past the anchor —
    // a racing metaData change that lands BEFORE our listing must not
    // be silently committed past
    val baseV = nextDeltaVersion(spark, targetPath) - 1
    val st0 = DeltaRead.replay(spark, targetPath, Some(baseV))
    val schemaJson = st0.schemaJson.getOrElse(throw new IllegalStateException(
      s"delta log at $targetPath has no metaData action"))
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    requireForeignAppendable(targetPath, st0, schema)
    // column ORDER is presentation, not schema (every write below
    // selects by NAME): require the same name set with the same types
    def byName(st: StructType) =
      st.fields.map(f => f.name -> normType(f.dataType)).toMap
    if (byName(df.schema) != byName(schema) ||
        df.schema.size != schema.size)
      throw new UnsupportedOperationException(
        s"appendForeign frame schema ${df.schema.simpleString} does not " +
          s"match the table's ${schema.simpleString} at $targetPath")
    // NOT NULL enforcement (the spec's writer obligation): nested
    // non-nullable fields decline by name; top-level ones are asserted
    // below with one aggregate pass over the (persisted) frame.
    schema.fields.filter(f => nestedNonNullable(f.dataType)).foreach { f =>
      throw new UnsupportedOperationException(
        s"column ${f.name} of $targetPath carries nested non-nullable " +
          "fields; appendForeign validates top-level NOT NULL only")
    }
    val notNullCols = schema.fields.filter(!_.nullable).map(_.name).toSeq
    val parts = st0.partitionCols
    val colMap = DeltaRead.colMapOf(targetPath, st0)
    def physOf(c: String) = colMap.getOrElse(c, c)
    // id mode (r15): every field must carry its delta.columnMapping.id
    // — colIdsOf validates recursively and loudly; the write then tags
    // parquet.field.id so id-binding readers resolve the new files
    val idMode =
      st0.config.get("delta.columnMapping.mode").contains("id")
    val colIds = if (idMode) DeltaRead.colIdsOf(targetPath, st0) else Map.empty[String, Int]
    // data files carry only DATA columns, under their physical shape
    val dataSel = schema.fields.toSeq.filterNot(f => parts.contains(f.name))
      .map { f =>
        val physT = physicalWriteType(f.dataType, idMode)
        val c = col(f.name)
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
        colIds.get(f.name).foreach(id => mb.putLong("parquet.field.id", id.toLong))
        (if (colMap.nonEmpty && physT != f.dataType) c.cast(physT) else c)
          .as(physOf(f.name), mb.build())
      }
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val staging = s"$targetPath/_graft_staging_$uuid"
    val conf = spark.sessionState.newHadoopConf()
    val fsys = new Path(targetPath).getFileSystem(conf)
    def publish(staged: Path, destName: String,
        pv: Map[String, String]): String = {
      val dest = new Path(targetPath, destName)
      if (!fsys.rename(staged, dest)) throw new java.io.IOException(
        s"staging publish failed for $dest")
      val stt = fsys.getFileStatus(dest)
      val pvJson = pv.toSeq.sortBy(_._1).map { case (k, v) =>
        val kq = "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        val vq = if (v == null) "null"
          else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        s"$kq:$vq"
      }.mkString(",")
      s"""{"add":{"path":"${encodePath(destName)}","partitionValues":{$pvJson},""" +
        s""""size":${stt.getLen},"modificationTime":${stt.getModificationTime},""" +
        s""""dataChange":true${statsFragment(conf, dest.toString)}}}"""
    }
    // Persist when a pass beyond the write itself reads the frame
    // (the partition-tuple collect). Without it a nondeterministic
    // input (rand(), re-evaluated shuffle) can re-evaluate differently
    // between passes — tuples absent from the collected map would
    // silently drop rows from the commit.
    val multiPass = parts.nonEmpty
    val src = if (multiPass)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    // NOT NULL validates from the STAGED footers (null counts ride
    // every parquet footer) instead of an aggregate prepass — no
    // persist, no second read of the frame; a violating append fails
    // BEFORE any file is published (the staging dir is discarded)
    val notNullData = notNullCols.filterNot(parts.contains)
      .map(n => physOf(n) -> n)
    def requireStagedNotNull(): Unit =
      if (notNullData.nonEmpty) {
        val counts = stagedNullCounts(conf, new Path(staging),
          notNullData.map(_._1))
        val violated = notNullData.flatMap { case (phys, logical) =>
          counts(phys) match {
            case Some(0L) => None
            case Some(c) => Some(s"$logical ($c nulls)")
            case None => throw new IllegalStateException(
              s"staged files carry no null-count statistics for $logical; " +
                "cannot validate NOT NULL")
          }
        }
        if (violated.nonEmpty) throw new IllegalArgumentException(
          s"appendForeign frame carries nulls in NOT NULL column(s) of " +
            s"$targetPath: ${violated.mkString(", ")}")
      }
    val adds = Seq.newBuilder[String]
    try {
      if (parts.isEmpty) {
        src.select(dataSel: _*).write.mode("overwrite").parquet(staging)
        requireStagedNotNull()
        fsys.listStatus(new Path(staging)).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, i) =>
            adds += publish(s.getPath, s"part-$uuid-$i.parquet", Map.empty)
          }
      } else {
        // identity partitioning: one broadcast tuple→index map keyed
        // null-safely, ONE distributed partitionBy write (no per-tuple
        // jobs), index dirs decode exactly (no path-unescape guesswork)
        val tuples = src.select(parts.map(col): _*).distinct().collect()
        notNullCols.filter(parts.contains).foreach { p =>
          val j = parts.indexOf(p)
          if (tuples.exists(_.isNullAt(j))) throw new IllegalArgumentException(
            s"appendForeign frame carries nulls in NOT NULL column(s) of " +
              s"$targetPath: $p (partition column)")
        }
        val idxSchema = StructType(
          parts.map(p => schema(p).copy(nullable = true)) :+
            StructField("__gp", IntegerType, nullable = false))
        import scala.jdk.CollectionConverters._
        val idxDf = spark.createDataFrame(
          tuples.zipWithIndex.map { case (r, i) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
          }.toSeq.asJava, idxSchema)
        // LEFT join + loud assert: with `src` persisted the tuple map
        // is consistent by construction, but if the cache is evicted
        // and a nondeterministic input re-evaluates, a row whose tuple
        // is absent from the map must FAIL the job, not silently drop.
        val joined = src.as("l").join(broadcast(idxDf.as("r")),
          parts.map(p => col(s"l.$p") <=> col(s"r.$p")).reduce(_ && _),
          "left")
        import org.apache.spark.sql.functions.{assert_true, lit, when => sqlWhen}
        val gpGuarded = sqlWhen(
          assert_true(col("r.__gp").isNotNull,
            lit("appendForeign: row's partition tuple is absent from the " +
              "collected map — nondeterministic input re-evaluated?")).isNull,
          col("r.__gp")).as("__gp")
        joined.select(dataSel.map(c => c) :+ gpGuarded: _*)
          .write.partitionBy("__gp").mode("overwrite").parquet(staging)
        requireStagedNotNull()
        tuples.zipWithIndex.foreach { case (r, i) =>
          val dir = new Path(staging, s"__gp=$i")
          if (fsys.exists(dir)) {
            val pv = parts.zipWithIndex.map { case (p, j) =>
              physOf(p) -> partitionValueString(r.get(j), schema(p).dataType)
            }.toMap
            fsys.listStatus(dir).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, k) =>
                adds += publish(s.getPath, s"part-$uuid-$i-$k.parquet", pv)
              }
          }
        }
      }
    } finally {
      if (multiPass) src.unpersist(): Unit
      fsys.delete(new Path(staging), true): Unit
    }
    val data = adds.result()
    // OCC commit: the data files are final; only the JSON number races.
    // Validation keys on the commit target moving past the anchored
    // base (not just on a put-if-absent collision), so intervening
    // commits are always re-checked for schema/protocol drift.
    var attempt = 0
    var lastErr: Throwable = null
    var validatedThrough = baseV
    while (attempt <= maxRetries) {
      val v = nextDeltaVersion(spark, targetPath)
      if (v != validatedThrough + 1) {
        val stNow = DeltaRead.replay(spark, targetPath, Some(v - 1))
        requireForeignAppendable(targetPath, stNow, schema)
        if (stNow.schemaJson != st0.schemaJson ||
            stNow.partitionCols != st0.partitionCols)
          throw new IllegalStateException(
            s"concurrent metaData change at $targetPath moved the schema " +
              "under this append; re-read the table and retry explicitly",
            lastErr)
        validatedThrough = v - 1
      }
      val actions =
        Seq("""{"commitInfo":{"operation":"WRITE","engineInfo":"graft-appendForeign"}}""") ++
          data
      try { writeCommit(spark, targetPath, v, actions); return v }
      catch {
        case e: Throwable
            if Option(e.getMessage).exists(_.contains("concurrent export")) ||
              e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] =>
          lastErr = e
          attempt += 1
      }
    }
    throw new java.io.IOException(
      s"commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }

  // ------------------------------------------------- foreign delete

  /** Writer features a COPY-ON-WRITE row deletion can honor. Deletes
    * differ from appends: obligations that constrain row VALUES
    * (CHECK constraints, invariants, generated/identity columns) are
    * preserved verbatim by a rewrite that only DROPS rows, so their
    * presence is honored here — but `rowTracking` pins per-row ids a
    * rewrite cannot carry, and anything outside this vocabulary
    * declines by name. `delta.appendOnly=true` declines regardless of
    * protocol version (the config flag is the obligation; the feature
    * name only makes it checkable). */
  private val DeletableWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "generatedColumns",
    "identityColumns", "changeDataFeed", "columnMapping", "timestampNtz",
    "deletionVectors", "v2Checkpoint", "domainMetadata")

  private def requireForeignDeletable(tablePath: String,
      st: DeltaRead.LogState): Unit = {
    if (st.minWriter > 7) throw new UnsupportedOperationException(
      s"delta table at $tablePath requires minWriterVersion ${st.minWriter}; " +
        "this writer speaks versions 1-7")
    if (st.minWriter >= 7) {
      val unsupported = st.writerFeatures -- DeletableWriterFeatures
      if (unsupported.nonEmpty) throw new UnsupportedOperationException(
        s"delta table at $tablePath requires writer feature(s) " +
          s"${unsupported.toSeq.sorted.mkString(", ")}; deleteForeign " +
          s"honors ${DeletableWriterFeatures.toSeq.sorted.mkString(", ")} only")
    }
    if (st.config.get("delta.appendOnly").exists(_.equalsIgnoreCase("true")))
      throw new UnsupportedOperationException(
        s"delta table at $tablePath is append-only (delta.appendOnly=true); " +
          "row deletion is forbidden by the table's own contract")
  }

  /** `partitionValues` JSON fragment of an add/remove/cdc action. */
  private def pvJsonOf(pv: Map[String, String]): String =
    pv.toSeq.sortBy(_._1).map { case (k, v) =>
      val kq = "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val vq = if (v == null) "null"
        else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      s"$kq:$vq"
    }.mkString(",")

  /** UPDATE rows matching `predicate` in ANY Delta table — the
    * copy-on-write sibling of [[deleteForeign]]: every file holding a
    * match rewrites with `sets` applied to its matching rows (other
    * rows byte-for-value preserved, deletion vectors applied first),
    * one remove+add commit under the same version-anchored OCC.
    *
    * CHANGE DATA FEED tables additionally publish the matched rows
    * BOTH ways — `update_preimage` and `update_postimage` — the spec's
    * required change shape for updates.
    *
    * Loud-or-exact: unlike deletes, an update CREATES values, so the
    * append-side obligations return — CHECK constraints, invariants,
    * and generated columns decline on PRESENCE, identity columns
    * decline when a SET targets them; `delta.appendOnly` and
    * `rowTracking` decline by name; a SET of a partition column
    * declines (it would move rows across partitions — re-ingest
    * through append+delete instead); every SET expression must
    * preserve its column's exact type; NOT NULL columns re-validate
    * from the staged footers; nondeterministic predicates or SET
    * expressions decline (the passes must agree).
    *
    * Scale: one full scan for per-file match counts (pushdown-pruned),
    * one scan of only the affected files for the rewrite, one
    * distributed partitionBy write. Returns the committed version, or
    * the current one, commit-free, when nothing matched. */
  def updateForeign(spark: SparkSession, targetPath: String,
      predicate: org.apache.spark.sql.Column,
      sets: Map[String, org.apache.spark.sql.Column],
      maxRetries: Int = 3): Long =
    updateForeignImpl(spark, targetPath, predicate, sets, maxRetries, () => ())

  private[graft] def updateForeignImpl(spark: SparkSession, targetPath: String,
      predicate: org.apache.spark.sql.Column,
      sets: Map[String, org.apache.spark.sql.Column],
      maxRetries: Int, beforeCommit: () => Unit): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, sum, when}
    import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
    require(sets.nonEmpty, "updateForeign needs at least one SET column")
    val currentV = nextDeltaVersion(spark, targetPath) - 1
    val st0 = DeltaRead.replay(spark, targetPath, Some(currentV))
    val schemaJson = st0.schemaJson.getOrElse(throw new IllegalStateException(
      s"delta log at $targetPath has no metaData action"))
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    requireForeignDeletable(targetPath, st0) // writer vocabulary + appendOnly
    // value-creating obligations (the appendForeign stance): an update
    // this writer cannot VALIDATE must not commit past them
    val constraints = st0.config.keys.filter(_.startsWith("delta.constraints."))
    if (constraints.nonEmpty) throw new UnsupportedOperationException(
      s"delta table at $targetPath declares CHECK constraint(s) " +
        s"${constraints.toSeq.sorted.mkString(", ")}; updateForeign cannot " +
        "validate them — update through an engine that can")
    schema.fields.foreach { f =>
      if (f.metadata.contains("delta.invariants"))
        throw new UnsupportedOperationException(
          s"column ${f.name} of $targetPath carries an invariant; " +
            "updateForeign cannot validate it")
      if (f.metadata.contains("delta.generationExpression"))
        throw new UnsupportedOperationException(
          s"column ${f.name} of $targetPath is a generated column; " +
            "updateForeign cannot guarantee the generation expression")
      if (f.metadata.json.contains("delta.identity.") && sets.contains(f.name))
        throw new UnsupportedOperationException(
          s"column ${f.name} of $targetPath is an identity column; " +
            "updateForeign cannot reassign its values")
    }
    val parts = st0.partitionCols
    sets.keys.foreach { n =>
      if (!schema.fieldNames.contains(n)) throw new IllegalArgumentException(
        s"SET column $n is not a column of $targetPath")
      if (parts.contains(n)) throw new UnsupportedOperationException(
        s"SET of partition column $n would move rows across partitions; " +
          "delete + append instead")
    }
    if (st0.adds.isEmpty) return currentV
    val colMap = DeltaRead.colMapOf(targetPath, st0)
    val colIds = DeltaRead.colIdsOf(targetPath, st0)
    val idMode = st0.config.get("delta.columnMapping.mode").contains("id")
    def physOf(c: String) = colMap.getOrElse(c, c)
    def keyOf(a: DeltaRead.AddFile): String = PathKeys.normKey(
      new Path(DeltaRead.resolvePath(targetPath, a.path)).toString)
    val FK = "__graft_fk"
    val matchedF = coalesce(predicate, lit(false))
    val allAdds = st0.adds.values.toSeq.sortBy(_.path)
    val fullScan = DeltaRead.scanAdds(spark, targetPath, allAdds, schema,
      parts, colMap, colIds, Some(FK))
    // the UPDATED logical view: matched rows take their SET values —
    // built once so the determinism probe, the type check, the rewrite
    // and the postimage all share the exact same expressions
    def updatedSel(matched: org.apache.spark.sql.Column)
        : Seq[org.apache.spark.sql.Column] =
      schema.fields.toSeq.map { f =>
        sets.get(f.name) match {
          case Some(v) => when(matched, v).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }
    // exact-type contract, checked on each SET expression's OWN type
    // (inside a when() Spark's coercion would silently cast — and an
    // ANSI cast failure mid-rewrite is the wrong place to learn a SET
    // was a string)
    sets.foreach { case (n, v) =>
      val got = fullScan.select(v.as("__graft_probe")).schema.head.dataType
      if (normType(got) != normType(schema(n).dataType))
        throw new UnsupportedOperationException(
          s"SET of $n produces ${got.simpleString}; the column is " +
            s"${schema(n).dataType.simpleString} — cast explicitly")
    }
    val probe = fullScan.select(updatedSel(matchedF) :+ col(FK): _*)
    // determinism guard over predicate AND set expressions
    val detOk = probe.filter(matchedF).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.deterministic
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.forall(_.deterministic)
    }.forall(identity)
    if (!detOk) throw new UnsupportedOperationException(
      "updateForeign needs deterministic predicate and SET expressions: " +
        "the match pass and the rewrite pass must agree on every row")
    val perFile = fullScan
      .groupBy(col(FK))
      .agg(count(lit(1)).as("n"),
        sum(when(matchedF, 1L).otherwise(0L)).as("m"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val affected = allAdds.filter(a => perFile.get(keyOf(a)).exists(_ > 0))
    if (affected.isEmpty) return currentV
    val cdfOn = st0.config.get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))
    val dataSel = schema.fields.toSeq.filterNot(f => parts.contains(f.name))
      .map { f =>
        val physT = physicalWriteType(f.dataType, idMode)
        val c = col(f.name)
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
        colIds.get(f.name).foreach(id =>
          mb.putLong("parquet.field.id", id.toLong))
        (if (colMap.nonEmpty && physT != f.dataType) c.cast(physT) else c)
          .as(physOf(f.name), mb.build())
      }
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val staging = s"$targetPath/_graft_staging_$uuid"
    val conf = spark.sessionState.newHadoopConf()
    val fsys = new Path(targetPath).getFileSystem(conf)
    def publish(staged: Path, destName: String, pv: Map[String, String],
        action: String, dataChange: Boolean): String = {
      val dest = new Path(targetPath, destName)
      Option(dest.getParent).foreach(fsys.mkdirs(_): Unit)
      if (!fsys.rename(staged, dest)) throw new java.io.IOException(
        s"staging publish failed for $dest")
      val stt = fsys.getFileStatus(dest)
      s"""{"$action":{"path":"${encodePath(destName)}",""" +
        s""""partitionValues":{${pvJsonOf(pv)}},"size":${stt.getLen},""" +
        (if (action == "add")
          s""""modificationTime":${stt.getModificationTime},"""
        else "") +
        s""""dataChange":$dataChange""" +
        (if (action == "add") statsFragment(conf, dest.toString) else "") + "}}"
    }
    def gpFrames(adds: Seq[DeltaRead.AddFile])
        : (Seq[(Map[String, String], Int)], org.apache.spark.sql.DataFrame) = {
      val tuples = adds.groupBy(_.partitionValues).toSeq
        .sortBy(_._1.toSeq.sorted.mkString(" ")).map(_._1).zipWithIndex
      val byTuple = tuples.toMap
      val rows = adds.map(a =>
        org.apache.spark.sql.Row(keyOf(a), byTuple(a.partitionValues)))
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("__gfk", StringType, nullable = false),
        StructField("__gp", IntegerType, nullable = false))))
      (tuples, df)
    }
    val notNullData = schema.fields.filter(!_.nullable).map(_.name).toSeq
      .filterNot(parts.contains).map(n => physOf(n) -> n)
    val adds = Seq.newBuilder[String]
    val cdcs = Seq.newBuilder[String]
    try {
      // the rewrite: every affected file's rows, matched ones updated
      val (tuples, gpMap) = gpFrames(affected)
      val affectedScan = DeltaRead.scanAdds(spark, targetPath, affected,
        schema, parts, colMap, colIds, Some(FK))
      affectedScan
        .select(updatedSel(matchedF) :+ col(FK): _*)
        .join(broadcast(gpMap), col(FK) === col("__gfk"))
        .select(dataSel :+ col("__gp"): _*)
        .write.partitionBy("__gp").mode("overwrite")
        .parquet(s"$staging/data")
      // NOT NULL re-validates on the staged result: a SET may have
      // introduced nulls the original files never carried
      if (notNullData.nonEmpty) {
        val counts = stagedNullCounts(conf, new Path(s"$staging/data"),
          notNullData.map(_._1))
        val violated = notNullData.flatMap { case (phys, logical) =>
          counts(phys) match {
            case Some(0L) => None
            case Some(c) => Some(s"$logical ($c nulls)")
            case None => throw new IllegalStateException(
              s"staged files carry no null-count statistics for $logical; " +
                "cannot validate NOT NULL")
          }
        }
        if (violated.nonEmpty) throw new IllegalArgumentException(
          s"updateForeign SET introduces nulls in NOT NULL column(s) of " +
            s"$targetPath: ${violated.mkString(", ")}")
      }
      tuples.foreach { case (pv, i) =>
        val dir = new Path(s"$staging/data", s"__gp=$i")
        if (fsys.exists(dir))
          fsys.listStatus(dir).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, k) =>
              adds += publish(s.getPath, s"part-$uuid-u$i-$k.parquet", pv,
                "add", dataChange = true)
            }
      }
      if (cdfOn) {
        // matched rows BOTH ways: preimage as stored, postimage updated
        val (cTuples, cGpMap) = gpFrames(affected)
        val matchedRows = DeltaRead.scanAdds(spark, targetPath, affected,
          schema, parts, colMap, colIds, Some(FK)).filter(matchedF)
        val pre = matchedRows.select(
          (schema.fields.toSeq.map(f => col(f.name)) :+
            lit("update_preimage").as("_change_type") :+ col(FK)): _*)
        val post = matchedRows
          .select(updatedSel(lit(true)) :+ col(FK): _*)
          .select((schema.fields.toSeq.map(f => col(f.name)) :+
            lit("update_postimage").as("_change_type") :+ col(FK)): _*)
        pre.unionByName(post)
          .join(broadcast(cGpMap), col(FK) === col("__gfk"))
          .select(dataSel :+ col("_change_type") :+ col("__gp"): _*)
          .write.partitionBy("__gp").mode("overwrite")
          .parquet(s"$staging/cdc")
        cTuples.foreach { case (pv, i) =>
          val dir = new Path(s"$staging/cdc", s"__gp=$i")
          if (fsys.exists(dir))
            fsys.listStatus(dir).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, k) =>
                cdcs += publish(s.getPath,
                  s"_change_data/cdc-$uuid-u$i-$k.parquet", pv,
                  "cdc", dataChange = false)
              }
        }
      }
    } finally fsys.delete(new Path(staging), true): Unit
    val now = System.currentTimeMillis()
    val removes = affected.map { a =>
      s"""{"remove":{"path":"${encodePath(a.path)}",""" +
        s""""deletionTimestamp":$now,"dataChange":true,""" +
        s""""partitionValues":{${pvJsonOf(a.partitionValues)}}""" +
        a.size.map(sz => s""","size":$sz""").getOrElse("") + "}}"
    }
    beforeCommit()
    var attempt = 0
    var lastErr: Throwable = null
    var validatedThrough = currentV
    while (attempt <= maxRetries) {
      val v = nextDeltaVersion(spark, targetPath)
      if (v != validatedThrough + 1) {
        val stNow = DeltaRead.replay(spark, targetPath, Some(v - 1))
        requireForeignDeletable(targetPath, stNow)
        if (stNow.schemaJson != st0.schemaJson ||
            stNow.partitionCols != st0.partitionCols)
          throw new IllegalStateException(
            s"concurrent metaData change at $targetPath moved the schema " +
              "under this update; re-read the table and retry explicitly",
            lastErr)
        affected.foreach { a =>
          stNow.adds.get(a.path) match {
            case Some(b) if b.dv == a.dv => ()
            case _ => throw new IllegalStateException(
              s"concurrent commit at $targetPath removed or rewrote " +
                s"${a.path} under this update; re-read and re-issue the " +
                "update against the new state", lastErr)
          }
        }
        validatedThrough = v - 1
      }
      val actions =
        Seq("""{"commitInfo":{"operation":"UPDATE","engineInfo":"graft-updateForeign"}}""") ++
          removes ++ adds.result() ++ cdcs.result()
      try { writeCommit(spark, targetPath, v, actions); return v }
      catch {
        case e: Throwable
            if Option(e.getMessage).exists(_.contains("concurrent export")) ||
              e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] =>
          lastErr = e
          attempt += 1
      }
    }
    throw new java.io.IOException(
      s"commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }

  /** MERGE-ON-READ delete into ANY Delta table that speaks deletion
    * vectors (r15 — the O(matched-rows) sibling of [[deleteForeign]]'s
    * copy-on-write): matched rows' physical positions merge into ONE
    * protocol-format deletion vector per affected file
    * ([[DeltaDv.writeDvFile]] — z85/RoaringBitmap, the format every DV
    * reader speaks), and the commit re-adds each affected file with
    * its CUMULATIVE vector (a Delta DV is complete per file, never a
    * delta of a delta — existing DV positions are folded in). Data
    * files are never rewritten: on a 100 TB table a selective delete
    * costs O(matched rows), not O(bytes of every affected file) — the
    * GDPR-delete shape.
    *
    * Loud-or-exact: the table must ALREADY carry `deletionVectors` in
    * both reader and writer features (upgrading a foreign table's
    * protocol under other writers is not this writer's call — use
    * [[deleteForeign]] on tables without it); `delta.appendOnly` /
    * `rowTracking` / nondeterministic predicates decline as in the
    * CoW path; CDF tables get the deleted rows as `_change_data`
    * files in the same commit. Same version-anchored OCC. */
  def deleteForeignMoR(spark: SparkSession, targetPath: String,
      predicate: org.apache.spark.sql.Column, maxRetries: Int = 3): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
    import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
    val currentV = nextDeltaVersion(spark, targetPath) - 1
    val st0 = DeltaRead.replay(spark, targetPath, Some(currentV))
    val schemaJson = st0.schemaJson.getOrElse(throw new IllegalStateException(
      s"delta log at $targetPath has no metaData action"))
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    requireForeignDeletable(targetPath, st0)
    if (!(st0.minReader >= 3 && st0.readerFeatures.contains("deletionVectors") &&
        st0.minWriter >= 7 && st0.writerFeatures.contains("deletionVectors")))
      throw new UnsupportedOperationException(
        s"delta table at $targetPath does not speak deletionVectors; " +
          "upgrading a foreign table's protocol is not this writer's call — " +
          "use deleteForeign (copy-on-write) instead")
    if (st0.adds.isEmpty) return currentV
    val parts = st0.partitionCols
    val colMap = DeltaRead.colMapOf(targetPath, st0)
    val colIds = DeltaRead.colIdsOf(targetPath, st0)
    val idMode = st0.config.get("delta.columnMapping.mode").contains("id")
    def physOf(c: String) = colMap.getOrElse(c, c)
    def keyOf(a: DeltaRead.AddFile): String = PathKeys.normKey(
      new Path(DeltaRead.resolvePath(targetPath, a.path)).toString)
    val FK = "__graft_fk"
    val RI = "__graft_pos"
    val matchedF = coalesce(predicate, lit(false))
    val allAdds = st0.adds.values.toSeq.sortBy(_.path)
    val fullScan = DeltaRead.scanAdds(spark, targetPath, allAdds, schema,
      parts, colMap, colIds, Some(FK), Some(RI))
    val detOk = fullScan.filter(matchedF).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.deterministic
    }.forall(identity)
    if (!detOk) throw new UnsupportedOperationException(
      "deleteForeignMoR needs a deterministic predicate: the published " +
        "tombstones must be the rows the caller saw match")
    // matched coordinates, grouped per file — O(matched rows) driver,
    // the MoR boundedness contract
    val newPos: Map[String, Seq[Long]] = fullScan.filter(matchedF)
      .select(col(FK), col(RI)).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, ps) => k -> ps.map(_._2).toSeq.sorted }
    if (newPos.isEmpty) return currentV
    val affected = allAdds.filter(a => newPos.contains(keyOf(a)))
    val cdfOn = st0.config.get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))
    val conf = spark.sessionState.newHadoopConf()
    val fsys = new Path(targetPath).getFileSystem(conf)
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    // one cumulative DV per affected file: existing positions fold in
    val dvAdds = affected.map { a =>
      val existing = a.dv.map(d =>
        DeltaDv.positions(spark, targetPath, d).toSeq).getOrElse(Nil)
      val cumulative = (existing ++ newPos(keyOf(a))).distinct.sorted
      val dvUuid = java.util.UUID.randomUUID()
      val desc = DeltaDv.writeDvFile(spark, targetPath, dvUuid, cumulative)
      val p = new Path(DeltaRead.resolvePath(targetPath, a.path))
      val (len, mt) = a.size match {
        case Some(sz) => (sz, a.modTime)
        case None =>
          val stt = p.getFileSystem(conf).getFileStatus(p)
          (stt.getLen, stt.getModificationTime)
      }
      val statsJson = a.stats.map(s =>
        s""","stats":"${s.replace("\\", "\\\\").replace("\"", "\\\"")}"""")
        .getOrElse("")
      s"""{"add":{"path":"${encodePath(a.path)}",""" +
        s""""partitionValues":{${pvJsonOf(a.partitionValues)}},""" +
        s""""size":$len,"modificationTime":$mt,"dataChange":true$statsJson,""" +
        s""""deletionVector":{"storageType":"${desc.storageType}",""" +
        s""""pathOrInlineDv":"${desc.pathOrInlineDv}",""" +
        desc.offset.map(o => s""""offset":$o,""").getOrElse("") +
        s""""sizeInBytes":${desc.sizeInBytes},""" +
        s""""cardinality":${desc.cardinality}}}}"""
    }
    // CDF: the deleted rows themselves, staged exactly as the CoW path
    val cdcs = Seq.newBuilder[String]
    if (cdfOn) {
      val staging = s"$targetPath/_graft_staging_$uuid"
      val dataSel = schema.fields.toSeq.filterNot(f => parts.contains(f.name))
        .map { f =>
          val physT = physicalWriteType(f.dataType, idMode)
          val c = col(f.name)
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
          colIds.get(f.name).foreach(id =>
            mb.putLong("parquet.field.id", id.toLong))
          (if (colMap.nonEmpty && physT != f.dataType) c.cast(physT) else c)
            .as(physOf(f.name), mb.build())
        }
      def publish(staged: Path, destName: String,
          pv: Map[String, String]): String = {
        val dest = new Path(targetPath, destName)
        Option(dest.getParent).foreach(fsys.mkdirs(_): Unit)
        if (!fsys.rename(staged, dest)) throw new java.io.IOException(
          s"staging publish failed for $dest")
        val stt = fsys.getFileStatus(dest)
        s"""{"cdc":{"path":"${encodePath(destName)}",""" +
          s""""partitionValues":{${pvJsonOf(pv)}},"size":${stt.getLen},""" +
          s""""dataChange":false}}"""
      }
      try {
        val tuples = affected.groupBy(_.partitionValues).toSeq
          .sortBy(_._1.toSeq.sorted.mkString(" ")).map(_._1).zipWithIndex
        val byTuple = tuples.toMap
        import scala.jdk.CollectionConverters._
        val gpMap = spark.createDataFrame(
          affected.map(a => org.apache.spark.sql.Row(
            keyOf(a), byTuple(a.partitionValues))).asJava,
          StructType(Seq(StructField("__gfk", StringType, nullable = false),
            StructField("__gp", IntegerType, nullable = false))))
        DeltaRead.scanAdds(spark, targetPath, affected, schema, parts,
          colMap, colIds, Some(FK))
          .filter(matchedF)
          .join(broadcast(gpMap), col(FK) === col("__gfk"))
          .select(dataSel :+ lit("delete").as("_change_type") :+ col("__gp"): _*)
          .write.partitionBy("__gp").mode("overwrite")
          .parquet(s"$staging/cdc")
        tuples.foreach { case (pv, i) =>
          val dir = new Path(s"$staging/cdc", s"__gp=$i")
          if (fsys.exists(dir))
            fsys.listStatus(dir).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, k) =>
                cdcs += publish(s.getPath,
                  s"_change_data/cdc-$uuid-$i-$k.parquet", pv)
              }
        }
      } finally fsys.delete(new Path(staging), true): Unit
    }
    val now = System.currentTimeMillis()
    val removes = affected.map { a =>
      s"""{"remove":{"path":"${encodePath(a.path)}",""" +
        s""""deletionTimestamp":$now,"dataChange":true,""" +
        s""""partitionValues":{${pvJsonOf(a.partitionValues)}}""" +
        a.size.map(sz => s""","size":$sz""").getOrElse("") + "}}"
    }
    var attempt = 0
    var lastErr: Throwable = null
    var validatedThrough = currentV
    while (attempt <= maxRetries) {
      val v = nextDeltaVersion(spark, targetPath)
      if (v != validatedThrough + 1) {
        val stNow = DeltaRead.replay(spark, targetPath, Some(v - 1))
        requireForeignDeletable(targetPath, stNow)
        if (stNow.schemaJson != st0.schemaJson ||
            stNow.partitionCols != st0.partitionCols)
          throw new IllegalStateException(
            s"concurrent metaData change at $targetPath moved the schema " +
              "under this delete; re-read the table and retry explicitly",
            lastErr)
        affected.foreach { a =>
          stNow.adds.get(a.path) match {
            case Some(b) if b.dv == a.dv => ()
            case _ => throw new IllegalStateException(
              s"concurrent commit at $targetPath removed or rewrote " +
                s"${a.path} under this delete; re-read and re-issue the " +
                "delete against the new state", lastErr)
          }
        }
        validatedThrough = v - 1
      }
      val actions =
        Seq("""{"commitInfo":{"operation":"DELETE","engineInfo":"graft-deleteForeignMoR"}}""") ++
          removes ++ dvAdds ++ cdcs.result()
      try { writeCommit(spark, targetPath, v, actions); return v }
      catch {
        case e: Throwable
            if Option(e.getMessage).exists(_.contains("concurrent export")) ||
              e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] =>
          lastErr = e
          attempt += 1
      }
    }
    throw new java.io.IOException(
      s"commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }

  /** DELETE the rows matching `predicate` from ANY Delta table —
    * including tables this engine did not create (r15; the symmetric
    * half of [[appendForeign]], and of the foreign ICEBERG delete
    * [[IcebergExport.appendEqualityDeletes]] already covers).
    *
    * COPY-ON-WRITE: affected files rewrite WITHOUT their matching rows
    * (deletion vectors apply first, so a DV'd input rewrites to its
    * live survivors and the new add carries no DV); files whose every
    * live row matches publish as pure removes. ONE commit: removes +
    * stats-bearing adds under the put-if-absent rule with bounded OCC
    * retry — on a version race the retry re-replays and every affected
    * file must still be live and unchanged, else the delete fails
    * loudly (a concurrent writer compacted or deleted under us;
    * re-running the predicate is the caller's decision, not this
    * writer's).
    *
    * CHANGE DATA FEED: with `delta.enableChangeDataFeed=true` the
    * commit also publishes every deleted row to `_change_data/` with
    * `_change_type='delete'` — the spec requires cdc actions whenever
    * a commit's file actions do not describe the change exactly, and a
    * partial-file rewrite never does.
    *
    * Loud-or-exact: `delta.appendOnly` and `rowTracking` decline by
    * name; NONDETERMINISTIC predicates decline (the match pass and the
    * rewrite pass could disagree and silently lose rows); name- and
    * id-mode column mappings both serve — candidates scan through
    * [[DeltaRead.scanAdds]]'s logical view, rewrites write physical
    * names (+ `parquet.field.id` in id mode).
    *
    * Scale: one scan of the whole table for per-file match counts
    * (predicate pushdown and add.stats skipping prune it), one scan of
    * only the PARTIALLY-matching files for survivors, one distributed
    * `partitionBy` write; driver work is O(affected files). Returns
    * the committed version — or the current version, commit-free, when
    * nothing matched. */
  def deleteForeign(spark: SparkSession,
      targetPath: String, predicate: org.apache.spark.sql.Column,
      maxRetries: Int = 3): Long =
    deleteForeignImpl(spark, targetPath, predicate, maxRetries, () => ())

  /** [[deleteForeign]] with a race seam: `beforeCommit` runs after the
    * rewrite is staged and before the OCC loop — the window a
    * concurrent writer's commit lands in. Tests plant a conflicting
    * commit there to pin the loud-conflict contract deterministically;
    * production callers never reach this overload. */
  private[graft] def deleteForeignImpl(spark: SparkSession,
      targetPath: String, predicate: org.apache.spark.sql.Column,
      maxRetries: Int, beforeCommit: () => Unit): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, not, sum, when}
    import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
    // version-ANCHORED base state: list first, then replay capped at
    // that version, so st0 is exactly the state of currentV even if a
    // concurrent commit lands mid-replay — the OCC loop below compares
    // every later state against this anchor
    val currentV = nextDeltaVersion(spark, targetPath) - 1
    val st0 = DeltaRead.replay(spark, targetPath, Some(currentV))
    val schemaJson = st0.schemaJson.getOrElse(throw new IllegalStateException(
      s"delta log at $targetPath has no metaData action"))
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    requireForeignDeletable(targetPath, st0)
    if (st0.adds.isEmpty) return currentV
    val parts = st0.partitionCols
    val colMap = DeltaRead.colMapOf(targetPath, st0)
    val colIds = DeltaRead.colIdsOf(targetPath, st0)
    val idMode = st0.config.get("delta.columnMapping.mode").contains("id")
    def physOf(c: String) = colMap.getOrElse(c, c)
    def keyOf(a: DeltaRead.AddFile): String = PathKeys.normKey(
      new Path(DeltaRead.resolvePath(targetPath, a.path)).toString)
    val FK = "__graft_fk"
    val matchedF = coalesce(predicate, lit(false))
    val allAdds = st0.adds.values.toSeq.sortBy(_.path)
    val fullScan = DeltaRead.scanAdds(spark, targetPath, allAdds, schema,
      parts, colMap, colIds, Some(FK))
    // determinism guard on the ANALYZED condition (an unresolved
    // rand() would claim deterministic): the match pass and the
    // rewrite pass must agree on every row, or rows are silently lost
    val detOk = fullScan.filter(matchedF).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.deterministic
    }.forall(identity)
    if (!detOk) throw new UnsupportedOperationException(
      "deleteForeign needs a deterministic predicate: the match pass and " +
        "the rewrite pass must agree on every row")
    // pass 1 — per-file live and matched counts, ONE distributed scan
    val perFile = fullScan
      .groupBy(col(FK))
      .agg(count(lit(1)).as("n"),
        sum(when(matchedF, 1L).otherwise(0L)).as("m"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val affected = allAdds.filter(a => perFile.get(keyOf(a)).exists(_._2 > 0))
    if (affected.isEmpty) return currentV
    val partials = affected.filter { a =>
      val (n, m) = perFile(keyOf(a)); m < n
    }
    val cdfOn = st0.config.get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))
    // data files carry only DATA columns, under their physical shape
    // (the appendForeign write contract)
    val dataSel = schema.fields.toSeq.filterNot(f => parts.contains(f.name))
      .map { f =>
        val physT = physicalWriteType(f.dataType, idMode)
        val c = col(f.name)
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
        colIds.get(f.name).foreach(id =>
          mb.putLong("parquet.field.id", id.toLong))
        (if (colMap.nonEmpty && physT != f.dataType) c.cast(physT) else c)
          .as(physOf(f.name), mb.build())
      }
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val staging = s"$targetPath/_graft_staging_$uuid"
    val conf = spark.sessionState.newHadoopConf()
    val fsys = new Path(targetPath).getFileSystem(conf)
    def publish(staged: Path, destName: String, pv: Map[String, String],
        action: String, dataChange: Boolean): String = {
      val dest = new Path(targetPath, destName)
      Option(dest.getParent).foreach(fsys.mkdirs(_): Unit)
      if (!fsys.rename(staged, dest)) throw new java.io.IOException(
        s"staging publish failed for $dest")
      val stt = fsys.getFileStatus(dest)
      // cdc actions carry path/partitionValues/size/dataChange only —
      // modificationTime and stats are add-action fields
      s"""{"$action":{"path":"${encodePath(destName)}",""" +
        s""""partitionValues":{${pvJsonOf(pv)}},"size":${stt.getLen},""" +
        (if (action == "add")
          s""""modificationTime":${stt.getModificationTime},"""
        else "") +
        s""""dataChange":$dataChange""" +
        (if (action == "add") statsFragment(conf, dest.toString) else "") + "}}"
    }
    // the gp index: one broadcast (file key → group) map; groups are
    // the distinct partition TUPLES of the files being rewritten, so
    // several affected files of one partition compact into its group
    def gpFrames(adds: Seq[DeltaRead.AddFile])
        : (Seq[(Map[String, String], Int)], org.apache.spark.sql.DataFrame) = {
      val tuples = adds.groupBy(_.partitionValues).toSeq
        .sortBy(_._1.toSeq.sorted.mkString(" ")).map(_._1).zipWithIndex
      val byTuple = tuples.toMap
      val rows = adds.map(a =>
        org.apache.spark.sql.Row(keyOf(a), byTuple(a.partitionValues)))
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("__gfk", StringType, nullable = false),
        StructField("__gp", IntegerType, nullable = false))))
      (tuples, df)
    }
    val adds = Seq.newBuilder[String]
    val cdcs = Seq.newBuilder[String]
    try {
      if (partials.nonEmpty) {
        // pass 2 — survivors of the partial files only, one job
        val (tuples, gpMap) = gpFrames(partials)
        DeltaRead.scanAdds(spark, targetPath, partials, schema, parts,
          colMap, colIds, Some(FK))
          .filter(not(matchedF))
          .join(broadcast(gpMap), col(FK) === col("__gfk"))
          .select(dataSel :+ col("__gp"): _*)
          .write.partitionBy("__gp").mode("overwrite")
          .parquet(s"$staging/data")
        tuples.foreach { case (pv, i) =>
          val dir = new Path(s"$staging/data", s"__gp=$i")
          if (fsys.exists(dir))
            fsys.listStatus(dir).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, k) =>
                adds += publish(s.getPath, s"part-$uuid-d$i-$k.parquet", pv,
                  "add", dataChange = true)
              }
        }
      }
      if (cdfOn) {
        // the deleted rows themselves, as the spec's change-data files
        val (tuples, gpMap) = gpFrames(affected)
        DeltaRead.scanAdds(spark, targetPath, affected, schema, parts,
          colMap, colIds, Some(FK))
          .filter(matchedF)
          .join(broadcast(gpMap), col(FK) === col("__gfk"))
          .select(dataSel :+ lit("delete").as("_change_type") :+ col("__gp"): _*)
          .write.partitionBy("__gp").mode("overwrite")
          .parquet(s"$staging/cdc")
        tuples.foreach { case (pv, i) =>
          val dir = new Path(s"$staging/cdc", s"__gp=$i")
          if (fsys.exists(dir))
            fsys.listStatus(dir).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, k) =>
                cdcs += publish(s.getPath,
                  s"_change_data/cdc-$uuid-$i-$k.parquet", pv,
                  "cdc", dataChange = false)
              }
        }
      }
    } finally fsys.delete(new Path(staging), true): Unit
    val now = System.currentTimeMillis()
    val removes = affected.map { a =>
      s"""{"remove":{"path":"${encodePath(a.path)}",""" +
        s""""deletionTimestamp":$now,"dataChange":true,""" +
        s""""partitionValues":{${pvJsonOf(a.partitionValues)}}""" +
        a.size.map(sz => s""","size":$sz""").getOrElse("") + "}}"
    }
    beforeCommit()
    // OCC commit: rewritten files are final; only the JSON number
    // races. A delete conflicts with ANY intervening commit that
    // touched its affected files, not just one that takes our exact
    // version slot — so validation keys on the commit TARGET moving
    // past the anchored base, which catches racing commits that landed
    // before we listed just as well as put-if-absent collisions.
    var attempt = 0
    var lastErr: Throwable = null
    var validatedThrough = currentV
    while (attempt <= maxRetries) {
      val v = nextDeltaVersion(spark, targetPath)
      if (v != validatedThrough + 1) {
        val stNow = DeltaRead.replay(spark, targetPath, Some(v - 1))
        requireForeignDeletable(targetPath, stNow)
        if (stNow.schemaJson != st0.schemaJson ||
            stNow.partitionCols != st0.partitionCols)
          throw new IllegalStateException(
            s"concurrent metaData change at $targetPath moved the schema " +
              "under this delete; re-read the table and retry explicitly",
            lastErr)
        affected.foreach { a =>
          stNow.adds.get(a.path) match {
            case Some(b) if b.dv == a.dv => ()
            case _ => throw new IllegalStateException(
              s"concurrent commit at $targetPath removed or rewrote " +
                s"${a.path} under this delete; re-read and re-issue the " +
                "delete against the new state", lastErr)
          }
        }
        validatedThrough = v - 1
      }
      val actions =
        Seq("""{"commitInfo":{"operation":"DELETE","engineInfo":"graft-deleteForeign"}}""") ++
          removes ++ adds.result() ++ cdcs.result()
      try { writeCommit(spark, targetPath, v, actions); return v }
      catch {
        case e: Throwable
            if Option(e.getMessage).exists(_.contains("concurrent export")) ||
              e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] =>
          lastErr = e
          attempt += 1
      }
    }
    throw new java.io.IOException(
      s"commit to $targetPath still conflicting after $maxRetries retries",
      lastErr)
  }
}
