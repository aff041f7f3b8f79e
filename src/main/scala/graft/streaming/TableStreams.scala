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

  def appendStream(incoming: DataFrame, path: String, checkpoint: String): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TimeTravel.appendOnce(batch, path, s"stream:$batchId"): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
