package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming face of the distribution-drift monitor
  * ([[graft.queries.ProfileQueries.qDriftDetect]]): the arriving stream's
  * per-category counts are maintained incrementally and compared against
  * a static REFERENCE distribution after every micro-batch — the
  * "did upstream silently change its mix" alarm evaluated continuously
  * instead of at the next batch audit.
  *
  * Counts are the simplest mergeable sketch (per-category sums), so the
  * streaming total is EXACTLY the batch count — the drift report after N
  * micro-batches is identical to the batch report over the same rows
  * (StreamingSpec asserts equality), same argument as
  * [[SketchStreams]]'s CMS.
  *
  * Replay safety: each micro-batch OVERWRITES its own `batch_id`-keyed
  * partition with that batch's category counts (the batch-scoped-path
  * trick); an at-least-once foreachBatch replay rewrites the same
  * partition instead of double-counting. State is O(batches ×
  * categories) rows — planning-scale, independent of stream volume.
  */
object DriftStreams {

  /** Per micro-batch: write this batch's per-category counts under its
    * own batch-id partition. */
  def countStream(incoming: DataFrame, path: String, checkpoint: String,
      categoryCol: String): Unit = {
    val q = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.groupBy(col(categoryCol).as("category"))
          .agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The running drift report: stored batch counts summed per category
    * (exact — counts are mergeable), joined FULL OUTER against the
    * reference distribution so categories missing from either side
    * still surface, shares in exact integer basis points
    * (10 000·n div total), drift verdict at `thresholdBp`.
    *
    * `reference` is (category, n_ref) — the frozen training-corpus
    * distribution, O(categories). */
  def driftReport(spark: SparkSession, path: String, reference: DataFrame,
      thresholdBp: Long = 50L): DataFrame = {
    val cur = spark.read.parquet(path)
      .groupBy("category").agg(sum(col("n")).as("n_cur"))
    val joined = reference.withColumnRenamed("n", "n_ref")
      .join(cur, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val t = joined.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    joined.crossJoin(broadcast(t))
      .withColumn("ref_bp", expr("n_ref * 10000 div t_ref"))
      .withColumn("cur_bp", expr("n_cur * 10000 div t_cur"))
      .withColumn("delta_bp", col("cur_bp") - col("ref_bp"))
      .withColumn("drifted", abs(col("delta_bp")) > thresholdBp)
      .drop("t_ref", "t_cur")
      .orderBy("category")
  }
}
