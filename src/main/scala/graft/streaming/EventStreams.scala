package graft.streaming

import graft.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10).
  *
  * The reference's "streaming" is a manual batch CDC loop (state CSV +
  * re-list + anti-join, /root/reference/data_ingestion.py:56-66). Here
  * the same event-time operators declared in [[graft.queries.Events]]
  * run as real streams: file-source ingestion with watermarked windowed
  * aggregation, session windows, and append-mode stream dedup. Each
  * transform is written against an unbounded DataFrame, so the SAME
  * function serves batch (tested vs the DuckDB oracle through the batch
  * queries) and streaming (tested with availableNow triggers in
  * StreamingSpec).
  *
  * Scale: state lives in the checkpointed state store partitioned by
  * `user_id`/window key; watermarks bound it. `maxFilesPerTrigger`
  * paces backfills; `availableNow` drains a backlog exactly once.
  */
object EventStreams {

  /** Parquet schema of the events table as generated (ts stored as
    * nanosecond INT64 → read as long under nanosAsLong, rebuilt to µs). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded events source over a parquet directory. */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 10-minute aggregation with a 30-minute watermark —
    * the streaming face of q_events_tumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.toDouble(sum(Exact.units(col("value"), 2)), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("bucket_s"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows with a 30-minute gap — the streaming face of
    * q_events_session. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        Exact.toDouble(sum(Exact.units(col("value"), 2)), 2).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("start_s"),
        col("session_window.end").cast("long").as("end_s"),
        col("n_events"), col("sum_value"))

  /** Sliding 10-minute windows hopping every 5 (SURVEY §2.10): each
    * event lands in size/hop = 2 overlapping windows, so the emitted
    * per-window counts double-count by design. Same watermark bound as
    * the tumbling face; state is one row per (window, event_type). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.toDouble(sum(Exact.units(col("value"), 2)), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("bucket_s"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Watermarked exactly-once-per-key dedup (append mode). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Incremental refresh as a REAL stream — the reference's batch CDC
    * loop (list → diff → re-ingest → overwrite state,
    * data_ingestion.py:56-69) becomes: watermarked dedup upstream, then
    * each micro-batch UPSERTS into the `load_dt`-partitioned vector
    * store through foreachBatch. Restarts are safe: the checkpoint
    * replays at-least-once and the key-based upsert makes the store
    * idempotent (asserted in StreamingSpec). */
  def upsertStream(out: DataFrame, storePath: String, checkpoint: String): Unit = {
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.VectorStore.upsert(batch.sparkSession, storePath, batch)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain the stream once into an in-memory table and return it. */
  def runAvailableNow(spark: SparkSession, out: DataFrame, name: String,
      outputMode: String, checkpoint: String): DataFrame = {
    val q: DataStreamWriter[org.apache.spark.sql.Row] = out.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
    val started = q.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    started.awaitTermination()
    spark.table(name)
  }
}
