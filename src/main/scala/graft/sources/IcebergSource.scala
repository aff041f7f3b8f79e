package graft.sources

import org.apache.spark.sql.{DataFrame, GraftPlanApi, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** STREAMING SOURCE over an external ICEBERG table — completing the
  * interop matrix (read + stream × Delta/Iceberg, export → Delta):
  *
  * {{{ spark.readStream.format("graft-iceberg").load(path) }}}
  *
  * OFFSETS ARE SNAPSHOT POSITIONS in the metadata's snapshot list (the
  * order writers append commits in): the first batch is the snapshot
  * at the starting offset; every later batch reads the ADDED entries
  * of the manifests a newer snapshot's list introduced. Divergence is
  * LOUD, same contract as the Delta/native sources — a snapshot whose
  * list DROPPED an earlier manifest (compaction/expiry rewrote
  * history) or whose new manifests carry DELETED-status entries is not
  * an append, and the file diff would silently mis-serve; the stream
  * dies with the resync instruction. Delete files decline as always.
  *
  * Scale: per trigger one metadata JSON read; per batch O(new
  * manifests) Avro reads and a schema-pinned scan of exactly the added
  * files (Iceberg data files carry all columns — no value injection).
  */
class IcebergSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.map { case (k, v) => k.toLowerCase -> v }.getOrElse("path",
      throw new IllegalArgumentException("graft-iceberg requires a 'path' option"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(IcebergRead.schemaOf(
      IcebergRead.currentMetadata(sqlContext.sparkSession, pathOf(parameters)))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, pathOf(parameters))
}

final class IcebergStreamSource(spark: SparkSession, path: String) extends Source {

  override val schema: StructType =
    IcebergRead.schemaOf(IcebergRead.currentMetadata(spark, path))

  /** Offset = index of the CURRENT snapshot within the snapshot list
    * (1-based count of snapshots up to and including it). */
  override def getOffset: Option[Offset] = {
    val meta = IcebergRead.currentMetadata(spark, path)
    val snaps = IcebergRead.snapshotList(spark, path, meta)
    val curId = Option(meta.get("current-snapshot-id")).map(_.asLong())
    curId.flatMap(id => snaps.indexWhere(_._1 == id) match {
      case -1 => None
      case i => Some(LongOffset((i + 1).toLong))
    })
  }

  private def toN(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val meta = IcebergRead.currentMetadata(spark, path)
    val snaps = IcebergRead.snapshotList(spark, path, meta)
    val endN = toN(end).toInt
    require(endN <= snaps.size,
      s"offset $endN exceeds the snapshot list (${snaps.size}) at $path — " +
        "metadata was rewritten; restart the stream from a fresh checkpoint")
    def files(p: String) = IcebergRead.resolve(path, p).toString
    start.map(toN(_).toInt) match {
      case None =>
        val live = IcebergRead.liveFiles(spark, path, meta,
          Some(snaps(endN - 1)._1))
        if (live.isEmpty) emptyBatch()
        else GraftPlanApi.markFileRelationsStreaming(
          spark.read.schema(schema).parquet(live.map(files): _*))
      case Some(sinceN) =>
        val before = IcebergRead.manifestsOf(spark, path, snaps(sinceN - 1)._2)
        val after = IcebergRead.manifestsOf(spark, path, snaps(endN - 1)._2)
        val dropped = before.filterNot(after.toSet)
        if (dropped.nonEmpty) throw new IllegalStateException(
          s"iceberg table at $path dropped manifest(s) ${dropped.mkString(", ")} " +
            "since the last offset (compaction/expiry rewrote history); " +
            "resync from a fresh snapshot")
        val added = after.filterNot(before.toSet).flatMap { mp =>
          IcebergRead.entriesOf(spark, mp).map { case (status, p) =>
            if (status == 2) throw new IllegalStateException(
              s"iceberg manifest $mp deletes files; the append-only stream " +
                "cannot represent deletions — resync from a fresh snapshot")
            p
          }
        }
        if (added.isEmpty) emptyBatch()
        else GraftPlanApi.markFileRelationsStreaming(
          spark.read.schema(schema).parquet(added.map(files): _*))
    }
  }

  private def emptyBatch(): DataFrame =
    GraftPlanApi.streamingDataFrame(spark,
      spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow], schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"IcebergStreamSource[$path]"
}
