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
}
