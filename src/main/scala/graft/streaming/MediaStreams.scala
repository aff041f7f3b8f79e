package graft.streaming

import graft.operators.MultimodalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming faces of the multimodal quality operators — the gate an
  * audio/media ingest runs per micro-batch before anything lands in
  * the store. Like [[IncrementalDedup]], the kernels run as bounded
  * batch jobs inside `foreachBatch` (per-row decode needs no cross-
  * batch state), the stream supplies checkpointed batch boundaries,
  * and key-based store upserts absorb at-least-once replays.
  */
object MediaStreams {

  /** Batch form of the audio admission rule, shared by the stream and
    * its spec: decoded PCM whose clipping and leading-silence
    * fractions stay under the thresholds (numerator·10000 ≤
    * denominator·bps — exact integer arithmetic, no float ratios).
    * `maxClippedBps` / `maxLeadSilenceBps` are basis points (1% =
    * 100 bps). */
  def gateAudioBatch(incoming: DataFrame, binCol: String = "bytes",
      maxClippedBps: Long = 100, maxLeadSilenceBps: Long = 5000): DataFrame =
    MultimodalOps.audioQuality(incoming, binCol)
      .filter(col("decoded") &&
        col("n_clipped") * lit(10000L) <= col("n_samples") * lit(maxClippedBps) &&
        col("lead_silence") * lit(10000L) <= col("n_samples") * lit(maxLeadSilenceBps))

  /** Drive the audio gate as a stream: per micro-batch, decode +
    * filter, then upsert admitted rows into the store keyed on the
    * caller-provided id column — replays collapse on the key. The
    * rejected complement is the caller's quarantine query (run
    * [[gateAudioBatch]] with the filter inverted); this sink keeps
    * only the admitted set. */
  def gateAudioAndUpsertStream(incoming: DataFrame, storePath: String,
      checkpoint: String, idCol: String, binCol: String = "bytes",
      maxClippedBps: Long = 100, maxLeadSilenceBps: Long = 5000): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val admitted = gateAudioBatch(batch, binCol, maxClippedBps, maxLeadSilenceBps)
          .withColumn(graft.sources.VectorStore.KeyCol, col(idCol).cast("string"))
        graft.sources.VectorStore.upsert(batch.sparkSession, storePath, admitted)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
