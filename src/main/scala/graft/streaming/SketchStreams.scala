package graft.streaming

import graft.operators.SketchOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming face of the count-min sketch: incremental FREQUENCY
  * maintenance with O(sketch) state — the running "how often has key k
  * appeared so far" a 100 TB ingest keeps without ever rescanning
  * history (the CMS sibling of [[IncrementalDedup]]'s Bloom screen).
  *
  * Exactness across batching comes from CMS mergeability: counters are
  * elementwise sums, so (batch₁ ⊎ batch₂) ≡ one pass over both — the
  * streaming total is IDENTICAL to the batch sketch, not an
  * approximation of it (StreamingSpec asserts equality).
  *
  * Replay safety: at-least-once `foreachBatch` must not double-count a
  * replayed batch, so each micro-batch OVERWRITES its own
  * `batch_id`-keyed partition with that batch's sketch (the
  * batch-scoped-path trick from the tar export); the total is the
  * elementwise sum over stored batch sketches. State is
  * O(batches × width × depth) longs — KBs per batch, independent of
  * row count; compact by summing rows into one when batch count grows.
  */
object SketchStreams {

  /** Per micro-batch: build the batch's own sketch and overwrite its
    * batch-id partition under `path`. */
  def aggregateStream(incoming: DataFrame, path: String, checkpoint: String,
      keyCol: String, width: Int, depth: Int): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val cms = udaf(new SketchOps.CmsAggregator(width, depth))
        val counts = batch
          .select(md5(col(keyCol).cast("string")).as("mh"))
          .agg(cms(col("mh")).as("c"))
          .head.getSeq[Long](0)
        import spark.implicits._
        Seq((batchId, counts)).toDF("batch_id", "counts")
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The running total: elementwise sum of the stored batch sketches.
    * The fold is over O(batches) rows of fixed-size arrays — planning-
    * scale data, summed distributed via posexplode so no driver loop
    * grows with batch count. */
  def totalSketch(spark: SparkSession, path: String, width: Int, depth: Int): Seq[Long] = {
    val cells = spark.read.parquet(path)
      .select(posexplode(col("counts")).as(Seq("pos", "n")))
      .groupBy("pos").agg(sum("n").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    IndexedSeq.tabulate(width * depth)(i => cells.getOrElse(i, 0L))
  }
}
