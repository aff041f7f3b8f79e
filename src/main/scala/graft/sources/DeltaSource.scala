package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftPlanApi, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** STREAMING SOURCE over an external DELTA table — incremental
  * consumption of lakehouse data the engine doesn't own:
  *
  * {{{ spark.readStream.format("graft-delta").load(path) }}}
  *
  * OFFSETS ARE DELTA LOG VERSIONS (the same identification
  * [[TimeTravelSource]] makes for the native table, applied to the
  * public `_delta_log`): the first batch is the full current snapshot
  * ([[DeltaRead]]'s replay, file relations flipped streaming); every
  * later batch reads exactly the files the JSON commits in
  * (start, end] ADDED. A commit carrying a `remove` in that window is
  * NOT an append — the file diff would silently miss deletions — so
  * the stream fails LOUDLY with the resync instruction, the
  * append-only contract shared with the native source.
  * `startingVersion` resumes strictly after a known version.
  *
  * CHANGE-DATA-FEED mode (`option("readChangeFeed", "true")`): batches
  * carry `_change_type` + `_commit_version` beside the data columns.
  * Commits with `cdc` actions serve their change files (the writer's
  * row-level insert/delete/update_preimage/update_postimage rows);
  * pure-append commits serve their adds as inserts; a remove WITHOUT
  * change data still dies loudly — row-level churn is representable
  * only when the writer wrote it down.
  *
  * RATE LIMITING (`option("maxFilesPerTrigger", n)`): incremental
  * batches advance by whole commits whose summed add count stays ≤ n
  * (always ≥ 1 commit), so a backfill against a long log arrives in
  * bounded batches instead of one giant scan; the first-batch snapshot
  * is never split (it is one pinned version). The cap holds ACROSS
  * restarts too (r13, closing the r11/r12 v1-limitation): consumed
  * progress persists commit-driven under the source's own
  * metadataPath ([[SourceProgress]]) and re-seeds at construction, so
  * the first post-restart catch-up batch is as bounded as any other.
  *
  * Scale: per trigger, one driver-side log listing; per batch,
  * O(added files) JSON reads and a schema-pinned scan of exactly
  * those files — the Delta streaming-source cost model recovered from
  * the public protocol.
  */
class DeltaSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.map { case (k, v) => k.toLowerCase -> v }.getOrElse("path",
      throw new IllegalArgumentException("graft-delta requires a 'path' option"))

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.map { case (k, v) => k.toLowerCase -> v }
      .get("readchangefeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val base = DeltaRead.read(sqlContext.sparkSession, pathOf(parameters)).schema
    (shortName(), schema.getOrElse(
      if (cdfOf(parameters)) DeltaStreamSource.withCdfCols(base) else base))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val params = parameters.map { case (k, v) => k.toLowerCase -> v }
    if (params.contains("startingversion") && params.contains("startingtimestamp"))
      throw new IllegalArgumentException(
        "graft-delta accepts startingVersion OR startingTimestamp, not both")
    // startingTimestamp = every change stamped AT or AFTER it: resolve
    // to the last commit strictly before (strictly-after resume
    // semantics); a timestamp predating the log serves the full
    // snapshot first, which IS everything
    val startV = params.get("startingversion").map(_.toLong)
      .orElse(params.get("startingtimestamp").map(_.toLong).flatMap { ts =>
        try Some(DeltaRead.versionAtTimestamp(
          sqlContext.sparkSession, pathOf(parameters), ts - 1))
        catch {
          case e: IllegalArgumentException if e.getMessage.contains("predates") =>
            None
        }
      })
    new DeltaStreamSource(sqlContext.sparkSession, pathOf(parameters),
      startV, cdf = cdfOf(parameters),
      maxFilesPerTrigger = params.get("maxfilespertrigger").map(_.toInt),
      metadataPath = Some(metadataPath))
  }
}

private[sources] object DeltaStreamSource {
  def withCdfCols(base: StructType): StructType =
    StructType(base.fields.toSeq
      :+ org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType)
      :+ org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType))
}

final class DeltaStreamSource(spark: SparkSession, path: String,
    startingVersion: Option[Long], cdf: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None,
    metadataPath: Option[String] = None) extends Source {

  private def hfs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  // schema, partition columns AND column mapping pin at source
  // creation — a stream's shape is fixed for its lifetime (a mid-stream
  // metaData change dies loudly in the batch window)
  private val state0 = DeltaRead.replay(spark, path)
  private val partCols: Seq[String] = state0.partitionCols
  private val colMap: Map[String, String] = DeltaRead.colMapOf(path, state0)
  private val colIds: Map[String, Int] = DeltaRead.colIdsOf(path, state0)

  private val dataSchema: StructType = DeltaRead.read(spark, path).schema

  override val schema: StructType =
    if (cdf) DeltaStreamSource.withCdfCols(dataSchema) else dataSchema

  /** Latest committed JSON version (checkpoint-independent: commits
    * are the offset domain; a checkpoint only accelerates snapshot
    * replay). */
  private def latestVersion: Option[Long] = {
    val logDir = new Path(s"$path/_delta_log")
    if (!hfs.exists(logDir)) None
    else hfs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong)
      .maxOption
  }

  /** Consumed progress for the RATE LIMIT: advanced by every planned
    * batch (getBatch sets it from both recovery-replayed and fresh
    * ranges) — the marker the next getOffset continues from. SEEDED
    * across restarts from the commit-driven [[SourceProgress]] record
    * under this source's metadataPath, so the cap holds on the first
    * post-restart catch-up batch too (the r12 v1-limitation close). */
  @volatile private var consumedV: Option[Long] =
    metadataPath.flatMap(SourceProgress.read(spark, _)).map(_.trim.toLong)

  /** maxFilesPerTrigger: cap a batch at whole COMMITS whose summed
    * `add` count stays ≤ the limit (at least one commit always
    * advances — a single over-sized commit is served alone rather than
    * wedging the stream). The first batch is the pinned snapshot and
    * is never split: version granularity is what keeps each batch an
    * exact commit range, replayable from its offsets alone. */
  override def getOffset: Option[Offset] = {
    val latest = latestVersion
    (maxFilesPerTrigger, consumedV.orElse(startingVersion)) match {
      case (Some(k), Some(since)) =>
        latest.filter(_ > since).map { lv =>
          var v = since
          var files = 0
          var keep = true
          while (keep && v < lv) {
            val n = DeltaRead.addCountIn(spark, path, v + 1)
            if (files > 0 && files + n > k) keep = false
            else { files += n; v += 1; if (files >= k) keep = false }
          }
          LongOffset(v.max(since + 1))
        }
      case _ => latest.map(LongOffset(_))
    }
  }

  private def toVersion(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val endV = toVersion(end)
    consumedV = Some(endV) // rate-limit progress (recovery replays land here too)
    val empty = GraftPlanApi.streamingDataFrame(spark,
      spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema)
    start.map(toVersion).orElse(startingVersion) match {
      case None =>
        // first batch: the whole snapshot PINNED at the starting offset
        // (a commit landing mid-plan can't shear it); CDF mode stamps it
        // as the inserts of the pinned version
        val snap = DeltaRead.read(spark, path, asOf = Some(endV))
        GraftPlanApi.markFileRelationsStreaming(
          if (!cdf) snap
          else snap.withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(endV)))
      case Some(sinceV) if cdf =>
        val frames = DeltaRead.changesBetween(spark, path, sinceV, endV).flatMap {
          case (v, Right(cdcFiles)) =>
            Some(DeltaRead.scanCdc(spark, path, v, cdcFiles, dataSchema,
              partCols, colMap, colIds))
          case (v, Left(adds)) if adds.nonEmpty =>
            Some(DeltaRead.scanAddsAsInserts(spark, path, v, adds, dataSchema,
              partCols, colMap, colIds))
          case _ => None
        }
        if (frames.isEmpty) empty
        else GraftPlanApi.markFileRelationsStreaming(
          frames.reduce(_.unionByName(_)))
      case Some(sinceV) =>
        val added = DeltaRead.addsBetween(spark, path, sinceV, endV)
        if (added.isEmpty) empty
        else GraftPlanApi.markFileRelationsStreaming(
          DeltaRead.scanAdds(spark, path, added, schema, partCols, colMap, colIds))
    }
  }

  override def commit(end: Offset): Unit =
    if (maxFilesPerTrigger.nonEmpty)
      metadataPath.foreach(
        SourceProgress.write(spark, _, toVersion(end).toString))
  override def stop(): Unit = ()
  override def toString: String = s"DeltaStreamSource[$path]"
}
