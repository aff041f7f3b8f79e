package graft.streaming

import graft.sources.InvertedIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING maintenance of the inverted text index — the ingest-side
  * face of [[InvertedIndex]]: as documents arrive, each micro-batch's
  * postings land under a `batch_id=`-scoped directory (itself
  * cell-partitioned, so probes still prune to the pattern's cells
  * inside every batch dir), and the `_doclen`/`_stats` sidecars grow
  * batch-wise. The batch `searchBm25` probe runs UNCHANGED against
  * the streamed layout and scores identically to a from-scratch
  * build — BM25 only consumes postings + sidecars, and both are
  * complete (StreamingSpec asserts probe ≡ batch-build probe).
  *
  * Replay safety: at-least-once `foreachBatch` replays OVERWRITE
  * their own batch-id directory and doclen partition with identical
  * bytes (the batch-scoped-path trick); `_stats` is recomputed from
  * the complete doclen sidecar each batch, so a replay rewrites the
  * same values. No sink state anywhere.
  *
  * Scale: per batch, work is O(batch postings) — existing cells are
  * never read or rewritten; the one growing cost is directory count
  * (one per batch), which the batch [[InvertedIndex.build]] compacts
  * away on a periodic rebuild, exactly like the TimeTravel OPTIMIZE
  * trade.
  */
object IndexStreams {

  /** Per micro-batch: tokenize with the index's own shared pipeline
    * and overwrite this batch's postings + doclen partitions. */
  def appendInvertedStream(incoming: DataFrame, path: String, checkpoint: String,
      textCol: String = "text"): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val tok = InvertedIndex.tokenize(batch, textCol)
        tok.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
          .withColumn("cell", InvertedIndex.cellOf(col("term")))
          .repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$path/batch_id=$batchId")
        tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
          .write.mode("overwrite")
          .parquet(s"${InvertedIndex.doclenPath(path)}/batch_id=$batchId")
        // recomputed from the COMPLETE doclen sidecar -> replays
        // rewrite identical stats (tiny: O(docs) rows)
        spark.read.parquet(InvertedIndex.doclenPath(path))
          .agg(count(lit(1)).as("n_docs"), sum(col("dl")).cast("long").as("total_dl"))
          .coalesce(1).write.mode("overwrite")
          .parquet(InvertedIndex.statsPath(path))
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
