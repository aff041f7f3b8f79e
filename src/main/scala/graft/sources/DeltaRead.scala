package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Read-only DELTA LAKE interop: replay a real `_delta_log` (the
  * public protocol — JSON commit files plus optional parquet
  * checkpoints, last-writer-wins per file path) into the live file
  * list and scan it — so the engine queries lakehouse data IN PLACE,
  * no conversion pass. Scope is the protocol's reader-version-1
  * core:
  *
  *   - `_last_checkpoint` → `<v>.checkpoint.parquet` (add/remove/
  *     metaData/protocol action columns), then every `<v>.json`
  *     commit after it, ascending; actions apply in order — an `add`
  *     (re)registers its path, a `remove` tombstones it, the last
  *     `metaData` wins the schema;
  *   - partition values come from `add.partitionValues` (they are NOT
  *     in the data files) and are injected per file group as typed
  *     literals, exactly how Delta serves them;
  *   - features this reader cannot honor fail LOUDLY, never silently
  *     mis-read: `minReaderVersion > 1` (column mapping, v2
  *     checkpoints …) and deletion vectors on any live `add` decline
  *     with the feature named.
  *
  * Scale: log replay is driver-side O(actions) — the same planning
  * cost Delta itself pays; the scan is one parquet read per partition
  * group over exactly the live files, pushdown and pruning intact.
  * Checkpoint reading collects only the action columns.
  */
object DeltaRead {

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private[sources] final case class AddFile(path: String,
      partitionValues: Map[String, String])

  private[sources] final case class LogState(
      adds: Map[String, AddFile],
      schemaJson: Option[String],
      partitionCols: Seq[String],
      minReader: Int)

  /** The table's live snapshot as a DataFrame (`asOf` pins the replay
    * to a log version — the streaming source's first batch uses it so
    * a commit landing between offset resolution and batch planning
    * can't shear the snapshot). */
  def read(spark: SparkSession, tablePath: String,
      asOf: Option[Long] = None): DataFrame = {
    val st = replay(spark, tablePath, asOf)
    if (st.minReader > 1) throw new UnsupportedOperationException(
      s"delta table at $tablePath requires minReaderVersion ${st.minReader}; " +
        "this reader supports version 1 (no column mapping / v2 checkpoints)")
    val schemaJson = st.schemaJson.getOrElse(throw new IllegalStateException(
      s"delta log at $tablePath has no metaData action"))
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    if (st.adds.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // one scan per distinct partition tuple: the values live in the log
    // (null = absent key), not the files; absolute add.paths allowed
    else scanAdds(spark, tablePath, st.adds.values.toSeq, schema, st.partitionCols)
  }

  /** Log replay to the live state: checkpoint (if any, and at or
    * before `asOf`) then the JSON commits after it up to `asOf`
    * (default: everything). Exposed for the spec's protocol
    * assertions. */
  private[sources] def replay(spark: SparkSession, tablePath: String,
      asOf: Option[Long] = None): LogState = {
    val logDir = s"$tablePath/_delta_log"
    val f = fs(spark, tablePath)
    if (!f.exists(new Path(logDir)))
      throw new IllegalArgumentException(s"no _delta_log at $tablePath")
    val cp = lastCheckpoint(spark, logDir).filter(v => asOf.forall(v <= _))
    val start = cp.map(_ + 1).getOrElse(0L)
    var st = cp.map(v => fromCheckpoint(spark, logDir, v))
      .getOrElse(LogState(Map.empty, None, Seq.empty, 1))
    val commits = f.listStatus(new Path(logDir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(n => n.stripSuffix(".json").toLong)
      .filter(v => v >= start && asOf.forall(v <= _)).sorted
    commits.foreach { v =>
      st = commitBody(spark, logDir, v).foldLeft(st)((s, line) =>
        applyAction(s, mapper.readTree(line), f"$logDir/$v%020d.json"))
    }
    st
  }

  private def commitBody(spark: SparkSession, logDir: String, v: Long): Seq[String] = {
    val f = fs(spark, logDir)
    val in = f.open(new Path(logDir, f"$v%020d.json"))
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      out.toString("UTF-8")
    } finally in.close()
    body.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** The files ADDED by commits in (sinceV, toV] — the streaming
    * source's incremental batch. A `remove` (or a DV-bearing add) in
    * the window means the diff is NOT the row delta: fail loudly, the
    * same append-only contract as [[TimeTravel.appendedDirsSince]]. */
  private[sources] def addsBetween(spark: SparkSession, tablePath: String,
      sinceV: Long, toV: Long): Seq[AddFile] = {
    val logDir = s"$tablePath/_delta_log"
    ((sinceV + 1) to toV).flatMap { v =>
      commitBody(spark, logDir, v).flatMap { line =>
        val node = mapper.readTree(line)
        if (node.has("remove")) throw new IllegalStateException(
          s"delta table at $tablePath removed files in commit v$v; the " +
            "append-only stream cannot represent deletions — resync from a snapshot")
        val st = applyAction(LogState(Map.empty, None, Seq.empty, 1),
          node, f"$logDir/$v%020d.json")
        st.adds.values
      }
    }
  }

  /** Scan a set of adds under the table's schema with partition values
    * injected per group — shared by [[read]] and the streaming batch. */
  private[sources] def scanAdds(spark: SparkSession, tablePath: String,
      adds: Seq[AddFile], schema: StructType, partCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    def resolve(p: String): String = {
      val hp = new Path(p)
      if (hp.isAbsolute || hp.toUri.getScheme != null) hp.toString
      else s"$tablePath/$p"
    }
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
    val groups = adds.groupBy(_.partitionValues)
    groups.toSeq.map { case (pv, files) =>
      val base = spark.read.schema(dataSchema)
        .parquet(files.map(f => resolve(f.path)): _*)
      val withParts = partCols.foldLeft(base) { (df, pc) =>
        df.withColumn(pc, lit(pv.get(pc).orNull).cast(schema(pc).dataType))
      }
      withParts.select(schema.fieldNames.map(col).toSeq: _*)
    }.reduce(_.unionByName(_))
  }

  private def applyAction(st: LogState, node: JsonNode, where: String): LogState = {
    if (node.has("add")) {
      val a = node.get("add")
      if (a.has("deletionVector") && !a.get("deletionVector").isNull)
        throw new UnsupportedOperationException(
          s"delta add with a deletion vector in $where; this reader declines DV tables")
      val path = a.get("path").asText()
      val pv = Option(a.get("partitionValues")).map { p =>
        val it = p.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          if (!e.getValue.isNull) b += e.getKey -> e.getValue.asText()
        }
        b.result()
      }.getOrElse(Map.empty[String, String])
      st.copy(adds = st.adds + (path -> AddFile(path, pv)))
    } else if (node.has("remove")) {
      st.copy(adds = st.adds - node.get("remove").get("path").asText())
    } else if (node.has("metaData")) {
      val m = node.get("metaData")
      val parts = Option(m.get("partitionColumns"))
        .map(p => (0 until p.size()).map(p.get(_).asText())).getOrElse(Seq.empty)
      st.copy(schemaJson = Some(m.get("schemaString").asText()),
        partitionCols = parts)
    } else if (node.has("protocol")) {
      st.copy(minReader = node.get("protocol").get("minReaderVersion").asInt())
    } else st // commitInfo, txn, domainMetadata … are reader-irrelevant
  }

  private def lastCheckpoint(spark: SparkSession, logDir: String): Option[Long] = {
    val f = fs(spark, logDir)
    val p = new Path(logDir, "_last_checkpoint")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val body = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        out.toString("UTF-8")
      } finally in.close()
      Some(mapper.readTree(body).get("version").asLong())
    }
  }

  /** Rebuild state from a classic checkpoint — single-part
    * (`<v>.checkpoint.parquet`) or multi-part
    * (`<v>.checkpoint.<i>.<n>.parquet`, read as one set): the same
    * actions in columnar shape, already net-of-removes per the
    * protocol (a checkpoint lists only live adds plus tombstones we
    * can ignore for reads after their own commit window). */
  private def fromCheckpoint(spark: SparkSession, logDir: String, v: Long): LogState = {
    val f = fs(spark, logDir)
    val single = new Path(logDir, f"$v%020d.checkpoint.parquet")
    val parts: Seq[String] =
      if (f.exists(single)) Seq(single.toString)
      else {
        val prefix = f"$v%020d.checkpoint."
        val found = f.listStatus(new Path(logDir)).toSeq
          .map(_.getPath.getName)
          .filter(n => n.startsWith(prefix) && n.endsWith(".parquet"))
          .sorted
        if (found.isEmpty) throw new java.io.FileNotFoundException(
          s"_last_checkpoint names v$v but no checkpoint parquet exists in $logDir")
        found.map(n => s"$logDir/$n")
      }
    val df = spark.read.parquet(parts: _*)
    val cols = df.columns.toSet
    var st = LogState(Map.empty, None, Seq.empty, 1)
    if (cols.contains("protocol")) {
      val r = df.select("protocol.minReaderVersion").na.drop().collect()
      if (r.nonEmpty) st = st.copy(minReader = r.head.getInt(0))
    }
    if (cols.contains("metaData")) {
      val r = df.select("metaData.schemaString", "metaData.partitionColumns")
        .na.drop(Seq("schemaString")).collect()
      if (r.nonEmpty) st = st.copy(
        schemaJson = Some(r.head.getString(0)),
        partitionCols = Option(r.head.getSeq[String](1)).getOrElse(Seq.empty))
    }
    if (cols.contains("add")) {
      val hasDv = df.schema("add").dataType.asInstanceOf[StructType]
        .fieldNames.contains("deletionVector")
      val sel = if (hasDv)
        df.select("add.path", "add.partitionValues", "add.deletionVector")
      else df.select("add.path", "add.partitionValues")
      val adds = sel.na.drop(Seq("path")).collect().map { r =>
        if (hasDv && !r.isNullAt(2)) throw new UnsupportedOperationException(
          s"delta checkpoint add with a deletion vector at $logDir v$v")
        val pv = Option(r.getMap[String, String](1)).map(_.toMap)
          .getOrElse(Map.empty[String, String])
        r.getString(0) -> AddFile(r.getString(0), pv)
      }.toMap
      st = st.copy(adds = adds)
    }
    st
  }
}
