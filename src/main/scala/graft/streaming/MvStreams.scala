package graft.streaming

import graft.plans.MvCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING maintenance of the materialized view that
  * [[graft.plans.MvRewrite]] serves — the two halves of the MV story
  * joined: as the ingest stream advances the base table, per-batch
  * aggregate DELTAS accumulate cheaply, and `publish` folds them into
  * the MV parquet and (re)registers it, so registered dashboard
  * queries keep being answered from the materialization without
  * anyone re-aggregating the 100 TB base.
  *
  * Replay safety (the [[SketchStreams]] batch-scoped-path trick):
  * each micro-batch's per-key (count, sum) delta OVERWRITES its own
  * `batch_id` partition — an at-least-once `foreachBatch` replay
  * rewrites identical bytes instead of double-counting. Counts and
  * exact-integer cent sums are associative/commutative, so
  * fold-of-deltas ≡ from-scratch aggregate EXACTLY (the
  * `q_incr_agg_merge` claim, now streaming — MvSpec asserts the
  * served rows equal the batch recompute).
  *
  * Scale: per batch, state written is O(keys-in-batch); publish reads
  * O(batches × keys) delta rows — aggregate-sized, never the event
  * log — and the registered MV read stays O(keys).
  */
object MvStreams {

  /** Per micro-batch: aggregate the batch's per-key delta and
    * overwrite its batch-id partition under `deltaPath`. */
  def deltaStream(incoming: DataFrame, deltaPath: String, checkpoint: String,
      keyCol: String = "user_id", valueCol: String = "value"): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.groupBy(col(keyCol))
          .agg(count(lit(1)).as("n_events"),
            sum(expr(s"CAST(ROUND($valueCol * 100.0) AS BIGINT)")).as("sum_cents"))
          .write.mode("overwrite").parquet(s"$deltaPath/batch_id=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold the stored batch deltas into the MV parquet and register it
    * as the materialization of `defDf` (the base-table aggregate the
    * rewrite rule matches). One shuffle over delta rows — the event
    * log is never touched. */
  def publish(spark: SparkSession, deltaPath: String, mvPath: String,
      name: String, defDf: DataFrame, keyCol: String = "user_id"): Unit = {
    spark.read.parquet(deltaPath)
      .groupBy(col(keyCol))
      .agg(sum(col("n_events")).as("n_events"), sum(col("sum_cents")).as("sum_cents"))
      .write.mode("overwrite").parquet(mvPath)
    MvCatalog.registerMaterialized(spark, name, defDf, mvPath)
  }
}
