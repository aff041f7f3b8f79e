package graft.streaming

import graft.Exact
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
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
/** Input row for [[EventStreams.customSessionize]]. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value_units: Long)

/** Per-user open-session state carried in the state store. */
case class OpenSession(startUs: Long, endUs: Long, n: Long, sumUnits: Long)

/** Emitted closed session — matches q_events_session's row shape. */
case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long, sum_value: Double)

/** Tagged input row for [[EventStreams.streamingAsOf]]: one event of
  * either stream — a fact (left) when `is_fact`, else a
  * dimension-history (right) row. */
case class AsOfEvent(key: Long, ts: java.sql.Timestamp, is_fact: Boolean, id: Long)

/** One buffered fact awaiting finality. Once the watermark passes the
  * fact time, its BACKWARD candidate can never change (older rights
  * are final) — it locks into (b_time, b_id) so right-side pruning
  * can't lose it while a nearest-direction fact still waits on its
  * forward side. */
case class AsOfPending(t: Long, id: Long,
    b_time: Option[Long], b_id: Option[Long], b_locked: Boolean)

/** Per-key as-of buffer: facts not yet direction-final, and the right
  * rows still able to win a future match as (µs, id) pairs. */
case class AsOfBuffer(facts: List[AsOfPending], rights: List[(Long, Long)])

/** One emitted as-of match (right side null when no row qualifies). */
case class AsOfMatch(key: Long, fact_id: Long, fact_us: Long,
    right_id: Option[Long], right_us: Option[Long])

object EventStreams {

  /** Parquet schema of the events table with `ts` read as the given
    * physical type — the generator has emitted both nanosecond INT64
    * (→ LongType under nanosAsLong) and un-adjusted timestamp[us]
    * (→ TimestampNTZType) across rounds. */
  def rawSchema(tsType: DataType = LongType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded events source over a parquet directory. A one-time batch
    * footer probe (metadata only, no data read) discovers how `ts` is
    * encoded, so the stream sees a session-TZ TIMESTAMP regardless of
    * the generator's parquet encoding — same contract as
    * [[graft.Tables]]. When the directory is empty or absent at start
    * (the normal streaming bootstrap order: start the query, then let
    * files land), the probe falls back to the current generator
    * encoding (µs-NTZ) instead of crashing stream construction; the
    * probed encoding is then pinned for the stream's lifetime — a
    * source that mixes encodings within one directory is a generator
    * bug the batch loader would reject too. */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case scala.util.control.NonFatal(_) => TimestampNTZType }
    val base = spark.readStream
      .schema(rawSchema(tsType))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    tsType match {
      case LongType         => base.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => base.withColumn("ts", col("ts").cast(TimestampType))
      case _                => base
    }
  }

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

  /** Hourly OHLC bars — the streaming face of q_events_ohlc. The batch
    * query's row_number selection becomes `min_by`/`max_by` on
    * `(ts, event_id)` (mergeable aggregates, so partial state works in
    * the store); both orderings are total because event_id is unique,
    * so the two faces pick identical open/close rows. */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("window.start").cast("long").as("hr_s"),
        col("open"), col("high"), col("low"), col("close"), col("n_events"))

  /** Watermarked exactly-once-per-key dedup (append mode). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** CUSTOM state machine via `flatMapGroupsWithState` (SURVEY §2.10 —
    * the arbitrary-state API, distinct from the built-in
    * `session_window`): per-user sessionization with a 30-minute gap,
    * folding each user's events in event-time order against a
    * `GroupState[OpenSession]`. A gap closes the open session and emits
    * it; the trailing session stays in state (append semantics — it
    * would emit on event-time timeout once the watermark passes it,
    * exactly like the built-in session window's append mode).
    * StreamingSpec asserts emitted sessions equal the BATCH
    * sessionizer's output minus each user's trailing session.
    *
    * Scale: state is one small record per ACTIVE user, partitioned by
    * the group key in the state store and bounded by the watermark —
    * the standard shape for custom aggregations the window DSL can't
    * express. */
  def customSessionize(events: DataFrame): Dataset[ClosedSession] = {
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong
    val typed = events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        Exact.units(col("value"), 2).as("value_units"))
      .as[SessionEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val GapUs = 30L * 60 * 1000000
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var open = state.getOption
          events.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos)).foreach { e =>
            // floorDiv, not /: getTime truncates toward zero while
            // getNanos is always positive, so plain division would
            // double-count the sub-second part of pre-epoch timestamps
            val tUs = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000
            open match {
              case Some(s) if tUs - s.endUs > GapUs =>
                out += ClosedSession(userId, s.startUs, s.endUs, s.n,
                  s.sumUnits.toDouble / 100.0)
                open = Some(OpenSession(tUs, tUs, 1L, e.value_units))
              case Some(s) =>
                // a late-but-within-watermark event from a LATER micro-batch
                // can land inside (or before) the open session's span: merge
                // with min/max so lateness never shrinks the session or
                // inflates the next gap check. Residual deviation from the
                // batch sessionizer: an event more than `gap` BEFORE the open
                // session's start would, in batch order, form a separate
                // earlier session — append mode can't emit retroactively, so
                // it merges here (documented, exercised in StreamingSpec).
                open = Some(OpenSession(math.min(s.startUs, tUs), math.max(s.endUs, tUs),
                  s.n + 1, s.sumUnits + e.value_units))
              case None =>
                open = Some(OpenSession(tUs, tUs, 1L, e.value_units))
            }
          }
          open match {
            case Some(s) if state.hasTimedOut =>
              state.remove()
              out += ClosedSession(userId, s.startUs, s.endUs, s.n,
                s.sumUnits.toDouble / 100.0)
            case Some(s) =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000 + 30 * 60 * 1000)
            case None => ()
          }
          out.iterator
      }
  }

  /** Stream-STREAM AS-OF join — the streaming face of the native batch
    * operator ([[graft.plans.AsOfJoinOps]]) in all THREE directions,
    * with the batch operator's exact tie rules (equal right times →
    * greatest id, except Nearest's forward candidate → smallest id)
    * and optional tolerance. Spark's built-in stream joins can't
    * express "latest ≤ / first ≥" — they need ORDER among matches, not
    * a containment window — so the two streams union under one tag and
    * fold through `flatMapGroupsWithState`.
    *
    * Emission contract (append) — a fact emits exactly when its match
    * can no longer change, which differs per direction:
    *   - Backward: once the watermark passes the fact time `t` (older
    *     rights are final from then on).
    *   - Forward: once the watermark passes the current forward
    *     candidate's time (any later arrival is farther), or — with a
    *     tolerance — passes `t + tolerance` (null emit: nothing in
    *     bound can arrive anymore). WITHOUT a tolerance a candidate-less
    *     fact never finalizes; give unbounded-wait streams a tolerance.
    *   - Nearest: once the watermark passes `t + d` for the current
    *     winning distance `d` (a later arrival would be farther than
    *     both sides' candidates), or `t + tolerance` for the null case.
    * Facts above the final watermark stay buffered (same trailing rule
    * as [[customSessionize]]; StreamingSpec asserts emitted rows equal
    * the BATCH operator restricted to direction-final facts).
    *
    * Scale: state per key = facts inside their finality horizon plus
    * the in-lag right rows AND ONE older right row (for any future
    * fact, of the rights at-or-under the watermark only the LATEST can
    * ever win — older ones are pruned each invocation; a locked
    * nearest fact carries its own backward candidate precisely so this
    * prune stays safe). So state is O(lag window [+ tolerance]) per
    * key, never O(stream), partitioned by key in the state store. */
  def streamingAsOf(facts: DataFrame, rights: DataFrame,
      direction: graft.plans.AsOfDirection = graft.plans.AsOfDirection.Backward,
      toleranceUs: Option[Long] = None): Dataset[AsOfMatch] = {
    import graft.plans.AsOfDirection
    implicit val evEnc = Encoders.product[AsOfEvent]
    implicit val stEnc = Encoders.product[AsOfBuffer]
    implicit val outEnc = Encoders.product[AsOfMatch]
    implicit val longEnc = Encoders.scalaLong
    // floorDiv for pre-epoch correctness (getNanos is always positive)
    def usOf(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val dir = direction
    val bound = toleranceUs.getOrElse(Long.MaxValue)
    val hasTol = toleranceUs.isDefined
    val tagged = facts
      .select(col("key").cast("long").as("key"), col("ts"),
        lit(true).as("is_fact"), col("id").cast("long").as("id"))
      .unionByName(rights.select(col("key").cast("long").as("key"), col("ts"),
        lit(false).as("is_fact"), col("id").cast("long").as("id")))
      .withWatermark("ts", "30 minutes")
      .as[AsOfEvent]
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuffer, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, events: Iterator[AsOfEvent], state: GroupState[AsOfBuffer]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val buf = state.getOption.getOrElse(AsOfBuffer(Nil, Nil))
          val (newFacts, newRights) = events.toList.partition(_.is_fact)
          // (us, id)-ascending, indexed: every candidate lookup below is
          // a binary search, so an invocation costs O(F log R), not the
          // O(F·R) of list scans (R can reach thousands per key under a
          // long tolerance)
          val rightsVec = (buf.rights ++ newRights.map(e => (usOf(e.ts), e.id))).sorted.toVector
          // first index with time ≥ t (`strict=false`) or > t (`strict=true`)
          def bound_(t: Long, strict: Boolean): Int = {
            var lo = 0; var hi = rightsVec.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              val c = rightsVec(mid)._1
              if (c < t || (strict && c == t)) lo = mid + 1 else hi = mid
            }
            lo
          }
          // largest (time, id) with time ≤ t — equal-time ties take the
          // greatest id (sorted order makes it the block's last row)
          def backCand(t: Long): Option[(Long, Long)] = {
            val i = bound_(t, strict = true)
            if (i == 0) None else Some(rightsVec(i - 1))
          }
          // smallest time ≥ t; equal-time tie takes the greatest id for
          // Forward, the smallest for Nearest (the batch cursor's
          // look-ahead row)
          def fwdCand(t: Long): Option[(Long, Long)] = {
            val i = bound_(t, strict = false)
            if (i >= rightsVec.length) None
            else if (dir == AsOfDirection.Forward) Some(rightsVec(bound_(rightsVec(i)._1, strict = true) - 1))
            else Some(rightsVec(i))
          }

          // lock backward candidates: once wm ≥ t no older right can
          // arrive, so backCand(t) is final
          val pend = (buf.facts ++ newFacts.map(e =>
              AsOfPending(usOf(e.ts), e.id, None, None, b_locked = false)))
            .map { p =>
              if (!p.b_locked && wmUs >= p.t) {
                val b = backCand(p.t)
                AsOfPending(p.t, p.id, b.map(_._1), b.map(_._2), b_locked = true)
              } else p
            }

          // one evaluation per fact: emit now, or wait with the earliest
          // watermark position that could finalize it
          val evaluated: List[(AsOfPending, Option[AsOfMatch], Option[Long])] =
            pend.map { p =>
              if (!p.b_locked) (p, None, Some(p.t)) // nothing final before wm ≥ t
              else dir match {
                case AsOfDirection.Backward =>
                  val ok = p.b_time.exists(bt => p.t - bt <= bound)
                  (p, Some(AsOfMatch(key, p.id, p.t,
                    if (ok) p.b_id else None, if (ok) p.b_time else None)), None)
                case AsOfDirection.Forward =>
                  val fc = fwdCand(p.t)
                  if (fc.exists(_._1 <= wmUs) || (hasTol && wmUs - p.t >= bound)) {
                    val f = fc.filter(c => c._1 <= wmUs && c._1 - p.t <= bound)
                    (p, Some(AsOfMatch(key, p.id, p.t, f.map(_._2), f.map(_._1))), None)
                  } else (p, None,
                    (fc.map(_._1).toList ++ (if (hasTol) List(p.t + bound) else Nil)).minOption)
                case AsOfDirection.Nearest =>
                  val db = p.b_time.map(bt => p.t - bt).getOrElse(Long.MaxValue)
                  val fc = fwdCand(p.t)
                  val df = fc.map(_._1 - p.t).getOrElse(Long.MaxValue)
                  val dw = if (db <= df && db <= bound) db
                    else if (df <= bound) df else Long.MaxValue
                  if ((dw != Long.MaxValue && wmUs - p.t >= dw) || (hasTol && wmUs - p.t >= bound)) {
                    val m =
                      if (db <= df && db <= bound) AsOfMatch(key, p.id, p.t, p.b_id, p.b_time)
                      else if (df <= bound) AsOfMatch(key, p.id, p.t, fc.map(_._2), fc.map(_._1))
                      else AsOfMatch(key, p.id, p.t, None, None)
                    (p, Some(m), None)
                  } else (p, None,
                    ((if (dw != Long.MaxValue) List(p.t + dw) else Nil) ++
                      (if (hasTol) List(p.t + bound) else Nil)).minOption)
              }
            }
          val out = evaluated.collect { case (p, Some(m), _) => (p.t, p.id, m) }
            .sortBy(x => (x._1, x._2)).map(_._3)
          val waiting = evaluated.collect { case (p, None, _) => p }

          // prune: of the rights at-or-under the watermark only the
          // latest can ever match a future fact — every waiting fact's
          // other candidates are above the watermark (a locked nearest
          // fact carries its backward candidate in its own entry)
          val cut = bound_(wmUs, strict = true)
          val keptRights =
            (if (cut == 0) Nil else List(rightsVec(cut - 1))) ++ rightsVec.drop(cut)
          if (waiting.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsOfBuffer(waiting, keptRights))
            // every decision point is strictly above the current
            // watermark — otherwise the fact would have emitted now
            evaluated.collect { case (_, None, Some(d)) => d }.minOption
              .foreach(n => state.setTimeoutTimestamp(n / 1000 + 1))
          }
          out.iterator
      }
  }

  /** Stream-STREAM interval join (SURVEY §2.10 extension): clicks
    * joined to the same user's purchases arriving within 30 minutes —
    * the streaming face of q_events_attribution (equality asserted in
    * StreamingSpec).
    *
    * Both sides carry a watermark and the join condition bounds
    * `purchase_ts` relative to `click_ts` in BOTH directions, which is
    * exactly what Spark needs to expire join state: a buffered click is
    * dropped once the purchase watermark passes `click_ts + 30 min`, so
    * state is O(30 minutes of events), not O(stream). */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_uid"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    clicks.join(purchases,
        col("user_id") === col("p_uid") &&
          col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** Stream-STATIC enrichment join: the unbounded event stream joined
    * to a bounded dimension snapshot (here `customer` keyed by
    * user_id). Spark broadcasts the static side into every micro-batch
    * — no stream state at all, the standard shape for dimension
    * enrichment at 100 TB/day ingest. StreamingSpec asserts equality
    * with the batch inner join. */
  def enrichWithCustomers(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        events("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("c_mktsegment"))

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
