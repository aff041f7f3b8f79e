package graft.streaming

import graft.sources.TimeTravel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming writer for the versioned table: each micro-batch becomes
  * one TAGGED append commit ([[TimeTravel.appendOnce]]), so
  * at-least-once `foreachBatch` replays find their own tag and no-op —
  * EXACTLY-ONCE table contents with zero sink-side state, and every
  * batch boundary is a time-travelable snapshot (the Delta streaming-
  * sink idempotence design: txn identity lives in the commit log
  * itself). */
object TableStreams {

  /** `statsCols`/`bloomCols` opt each batch's commit into the per-file
    * skipping sidecars — streamed history stays sliceable by
    * [[graft.plans.StatsPrune]] with no backfill pass. */
  def appendStream(incoming: DataFrame, path: String, checkpoint: String,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TimeTravel.appendOnce(batch, path, s"stream:$batchId", statsCols, bloomCols): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming READER for the versioned table
    * ([[graft.sources.TimeTravelSource]]): offsets are versions, each
    * micro-batch is the manifest diff — the incremental-consumer face
    * every downstream index/MV maintainer previously hand-wired.
    * `startingVersion` resumes strictly after a known version;
    * `cdfKey` switches to change-feed mode (update semantics, rows
    * carry `_change_type`). */
  def readTableStream(spark: org.apache.spark.sql.SparkSession, path: String,
      startingVersion: Option[Long] = None,
      cdfKey: Option[String] = None): DataFrame = {
    var r = spark.readStream.format("graft-table")
    startingVersion.foreach(v => r = r.option("startingVersion", v.toString))
    cdfKey.foreach(k => r = r.option("streamMode", "cdf").option("key", k))
    r.load(path)
  }

  /** Table-to-table streaming pipe: consume `srcPath`'s appends and
    * commit each micro-batch into `sinkPath` exactly once — the
    * composed story (versioned source → versioned sink) that makes a
    * chain of tables incrementally consistent with zero hand-wired
    * polling. Returns the number of rows this invocation moved. */
  def pipeAppends(spark: org.apache.spark.sql.SparkSession, srcPath: String,
      sinkPath: String, checkpoint: String): Long = {
    val moved = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = readTableStream(spark, srcPath).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = batch.localCheckpoint()
        moved.addAndGet(rows.count())
        TimeTravel.appendOnce(rows, sinkPath, s"pipe:$batchId"): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    moved.get()
  }
}
