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
  * the external table follows the source without re-exporting. Each
  * exported commit records the graft version it mirrors in its
  * `commitInfo` (`graftSourceVersion`), which is what append resumes
  * from. Row-level/rewrite/schema-change graft commits cannot be
  * expressed as appended adds and decline loudly — re-export a fresh
  * snapshot for those.
  *
  * Loud-or-exact scope: a snapshot with pending deletion vectors or a
  * column mapping cannot be represented as reader-version-1 Delta
  * (its files alone over-serve rows / wrong names), so both decline
  * with the fix spelled out (OPTIMIZE folds DVs and rewrites mapped
  * eras into plain files, after which the export is exact).
  *
  * Scale: O(files) driver work per publish — one manifest read plus
  * one JSON write; no data bytes touched. append is O(new files). */
object DeltaExport {

  /** Absolute file path → the percent-encoded URI string the Delta
    * spec stores (RFC 2396; Hadoop Path.toUri escapes exactly the
    * reserved set). */
  private def encodePath(f: String): String =
    new Path(f).toUri.toASCIIString

  private def requireExportable(spark: SparkSession, sourcePath: String, v: Long): Unit = {
    if (TimeTravel.dvListing(spark, sourcePath, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"snapshot v$v of $sourcePath has pending deletion vectors; " +
          "reader-version-1 Delta cannot carry them — run TimeTravel.optimize " +
          "to fold them, then export the folded version")
    if (TimeTravel.colsListing(spark, sourcePath, v).nonEmpty)
      throw new UnsupportedOperationException(
        s"snapshot v$v of $sourcePath resolves through a column mapping; " +
          "its files carry physical names — run TimeTravel.optimize to " +
          "rewrite, then export the folded version")
  }

  private def addAction(conf: org.apache.hadoop.conf.Configuration, f: String): String = {
    val p = new Path(f)
    val st = p.getFileSystem(conf).getFileStatus(p)
    s"""{"add":{"path":"${encodePath(f)}","partitionValues":{},"size":${st.getLen},""" +
      s""""modificationTime":${st.getModificationTime},"dataChange":true}}"""
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
    * (default latest). Returns the number of data files published. */
  def snapshot(spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None): Int = {
    val v = version.getOrElse(TimeTravel.versions(spark, sourcePath).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no versions at $sourcePath")))
    requireExportable(spark, sourcePath, v)
    val dirs = TimeTravel.listing(spark, sourcePath, v)
    val scan = spark.read.parquet(dirs.map(d => s"$sourcePath/$d"): _*)
    val schemaJson = scan.schema.json
    val files = scan.inputFiles.sorted
    val conf = spark.sessionState.newHadoopConf()
    val esc = schemaJson.replace("\\", "\\\\").replace("\"", "\\\"")
    val actions = Seq.newBuilder[String]
    actions += commitInfo(v)
    actions += txnAction(v)
    actions += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    actions +=
      (s"""{"metaData":{"id":"graft-export","format":""" +
        s"""{"provider":"parquet","options":{}},"schemaString":"$esc",""" +
        """"partitionColumns":[],"configuration":{}}}""")
    files.foreach(f => actions += addAction(conf, f))
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
    * keeps an external table current. Only intervening APPEND graft
    * commits qualify; a row-level / rewrite / schema-change commit
    * declines loudly (re-export a fresh snapshot). Returns the number
    * of data files appended (0 = already current). */
  def append(spark: SparkSession, sourcePath: String, targetPath: String,
      toVersion: Option[Long] = None): Int = {
    val g0 = exportedSourceVersion(spark, targetPath)
    val g1 = toVersion.getOrElse(TimeTravel.versions(spark, sourcePath).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no versions at $sourcePath")))
    if (g1 <= g0) return 0
    requireExportable(spark, sourcePath, g1)
    ((g0 + 1) to g1).foreach { v =>
      val kind = TimeTravel.classifyCommit(spark, sourcePath, v)
      if (kind != TimeTravel.Append) throw new UnsupportedOperationException(
        s"graft commit v$v of $sourcePath is a $kind; only appends publish " +
          "incrementally — export a fresh snapshot for row-level/rewrite/DDL changes")
    }
    val newDirs = TimeTravel.listing(spark, sourcePath, g1)
      .filterNot(TimeTravel.listing(spark, sourcePath, g0).toSet)
    if (newDirs.isEmpty) { // metadata-only appends: record the watermark
      writeCommit(spark, targetPath, nextDeltaVersion(spark, targetPath),
        Seq(commitInfo(g1), txnAction(g1)))
      return 0
    }
    val scan = spark.read.parquet(newDirs.map(d => s"$sourcePath/$d"): _*)
    // the published metaData pins the schema; new files must match it
    val exported = DeltaRead.replay(spark, targetPath)
    if (exported.schemaJson.exists(_ != scan.schema.json))
      throw new UnsupportedOperationException(
        s"graft commits after v$g0 changed the data schema at $sourcePath; " +
          "the published Delta metaData is pinned — re-export a fresh snapshot")
    val files = scan.inputFiles.sorted
    val conf = spark.sessionState.newHadoopConf()
    val actions = Seq.newBuilder[String]
    actions += commitInfo(g1)
    actions += txnAction(g1)
    files.foreach(f => actions += addAction(conf, f))
    val deltaV = nextDeltaVersion(spark, targetPath)
    writeCommit(spark, targetPath, deltaV, actions.result())
    if (deltaV > 0 && deltaV % CheckpointInterval == 0)
      writeCheckpoint(spark, targetPath, deltaV, g1)
    files.length
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
    val fromCp = names
      .filter(_.endsWith(".checkpoint.parquet"))
      .flatMap(_.stripSuffix(".checkpoint.parquet").toLongOption)
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
    val addT = StructType(Seq(
      StructField("path", StringType), StructField("partitionValues",
        MapType(StringType, StringType)),
      StructField("size", LongType), StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
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
      StructField("minWriterVersion", IntegerType)))
    val txnT = StructType(Seq(
      StructField("appId", StringType), StructField("version", LongType)))
    val schema = StructType(Seq(StructField("add", addT),
      StructField("metaData", metaT), StructField("protocol", protoT),
      StructField("txn", txnT)))
    val rows = Seq(
      Row(null, null, Row(st.minReader, 2), null),
      Row(null, Row("graft-export", Row("parquet", Map.empty[String, String]),
        st.schemaJson.orNull, st.partitionCols, st.config), null, null),
      Row(null, null, null, Row("graft-export", graftV))) ++
      st.adds.values.toSeq.sortBy(_.path).map { a =>
        val p = new Path(a.path)
        val fst = p.getFileSystem(conf).getFileStatus(p)
        Row(Row(encodePath(a.path), a.partitionValues, fst.getLen,
          fst.getModificationTime, true), null, null, null)
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
}
