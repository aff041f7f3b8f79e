package graft.queries

import graft.operators.SkewOps
import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Event-stream analytics (SURVEY.md §2.10/§2.11-6): the batch-verifiable
  * faces of the streaming surface. The reference's incremental protocol is
  * timestamp-watermark CDC (`sharepointutils.py:159-161`); these queries
  * declare the event-time operator set (tumbling windows, gaps via lag,
  * sessionization, as-of lookup, pivot, JSON extraction) with DuckDB
  * oracles. The same transforms run under Structured Streaming in
  * [[graft.streaming.EventStreams]].
  *
  * Scale notes: every query shuffles once on `user_id` (or the group key)
  * — window functions and sessionization co-partition by user, so a
  * 100 TB event log distributes by key with no driver-side state.
  * Timestamps are compared/emitted as exact epoch-microsecond BIGINTs.
  */
object Events {

  import Exact._

  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")

  /** Tumbling 10-minute window aggregation via Spark's `window()`;
    * bucket emitted as epoch seconds so both engines hash identically. */
  val qTumbling: QueryDef = QueryDef.sql(
    "q_events_tumbling",
    """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_s,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY bucket_s, event_type""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        toDouble(sum(units(col("value"), 2)), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("bucket_s"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("bucket_s", "event_type")
  }

  /** Per-user inter-event gaps via lag(); exact µs difference. */
  val qLagGaps: QueryDef = QueryDef.sql(
    "q_events_lag",
    """SELECT user_id,
      |  COUNT(*) AS n_gaps,
      |  MIN(gap_us) AS min_gap_us,
      |  MAX(gap_us) AS max_gap_us,
      |  CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
      |FROM (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events
      |)
      |WHERE gap_us IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("sum_gap_us"))
      .orderBy("user_id")
  }

  /** Batch sessionization: a session breaks after a 30-minute silence.
    * Two stacked windows (gap flag → running session ordinal) then one
    * aggregation — the classic shuffle-once-per-user pattern that maps
    * 1:1 onto `session_window` in streaming. */
  val qSessionize: QueryDef = QueryDef.sql(
    "q_events_session",
    """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events,
      |  MIN(epoch_us(ts)) AS start_us,
      |  MAX(epoch_us(ts)) AS end_us,
      |  CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM (
      |  SELECT user_id, ts, value,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id, value,
      |      CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                > 1800000000 OR
      |                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM events
      |  )
      |)
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(running))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        toDouble(sum(units(col("value"), 2)), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** As-of lookup: each purchase joined to the user's most recent
    * prior-or-equal signup (SURVEY §2.4 J-ext). Composed from a
    * last(ignoreNulls) running window — no custom operator needed, and
    * it co-partitions by user (single shuffle, streamable). */
  val qAsOfSignup: QueryDef = QueryDef.sql(
    "q_events_asof",
    """SELECT event_id, user_id,
      |  epoch_us(ts) AS purchase_us,
      |  signup_us,
      |  epoch_us(ts) - signup_us AS wait_us
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_us
      |  FROM events
      |)
      |WHERE event_type = 'purchase' AND signup_us IS NOT NULL
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val running = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .withColumn("signup_us",
        last(when(col("event_type") === "signup", unix_micros(col("ts"))), ignoreNulls = true)
          .over(running))
      .filter(col("event_type") === "purchase" && col("signup_us").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        col("signup_us"),
        (unix_micros(col("ts")) - col("signup_us")).as("wait_us"))
      .orderBy("event_id")
  }

  /** Pivot: per-user event-type counts as wide columns. */
  val qPivotCounts: QueryDef = QueryDef.sql(
    "q_events_pivot",
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
      .orderBy("user_id")
  }

  /** JSON field extraction (F11): Spark parses `props` with from_json;
    * the oracle uses the JSON arrow operator. */
  val qJsonExtract: QueryDef = QueryDef.sql(
    "q_events_json",
    """SELECT k_bucket, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
      |FROM (SELECT CAST(props->>'$.k' AS INT) AS k,
      |             CAST(FLOOR(CAST(props->>'$.k' AS INT) / 10.0) AS INT) AS k_bucket
      |      FROM events)
      |GROUP BY k_bucket
      |ORDER BY k_bucket""".stripMargin) { (s, d) =>
    ev(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .withColumn("k_bucket", floor(col("k") / 10.0).cast(IntegerType))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
      .orderBy("k_bucket")
  }

  /** Funnel range self-join: purchases within 1 hour after an error by
    * the same user (non-equi time-range join, SURVEY §2.4 J3). */
  val qFunnel: QueryDef = QueryDef.sql(
    "q_events_funnel",
    """SELECT e1.event_id AS error_id, e1.user_id,
      |  COUNT(e2.event_id) AS purchases_1h
      |FROM (SELECT * FROM events WHERE event_type = 'error') e1
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') e2
      |  ON e1.user_id = e2.user_id
      | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
      |GROUP BY e1.event_id, e1.user_id
      |ORDER BY error_id""".stripMargin) { (s, d) =>
    val errors = ev(s, d).filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("err_ts"))
    val purchases = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    errors.join(purchases,
        col("user_id") === col("p_user") &&
        col("p_ts") > col("err_ts") &&
        col("p_ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
      .groupBy(col("error_id"), col("user_id"))
      .agg(count(col("p_id")).as("purchases_1h"))
      .orderBy("error_id")
  }

  /** Hopping (sliding) 10-minute windows every 5 minutes — the batch
    * face of [[graft.streaming.EventStreams.slidingCounts]]. Each event
    * belongs to exactly size/hop = 2 windows; the oracle unnests the
    * two window starts per event explicitly. */
  val qHopping: QueryDef = QueryDef.sql(
    "q_events_hopping",
    """SELECT bucket_s, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM (
      |  SELECT unnest([
      |      CAST(floor(epoch(ts) / 300) * 300 AS BIGINT),
      |      CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT)]) AS bucket_s,
      |    event_type, value
      |  FROM events
      |)
      |GROUP BY bucket_s, event_type
      |ORDER BY bucket_s, event_type""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        toDouble(sum(units(col("value"), 2)), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("bucket_s"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("bucket_s", "event_type")
  }

  /** rangeBetween sliding aggregate (SURVEY §2.6): per event, the sum
    * and count of the same user's values over the trailing 10 minutes
    * (value-range frame, not row frame — ties in ts are in-frame in both
    * engines, so the result is deterministic even with equal
    * timestamps). Exact µs bounds + integer units keep the hash stable. */
  val qSlidingRange: QueryDef = QueryDef.sql(
    "q_events_sliding",
    """SELECT event_id, user_id,
      |  epoch_us(ts) AS ts_us,
      |  CAST(n_10m AS BIGINT) AS n_10m,
      |  CAST(sum_units_10m AS DOUBLE) / 100.0 AS sum_10m
      |FROM (
      |  SELECT event_id, user_id, ts,
      |    COUNT(*) OVER w AS n_10m,
      |    SUM(CAST(ROUND(value * 100.0) AS BIGINT)) OVER w AS sum_units_10m
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      |)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-600000000L, Window.currentRow)
    ev(s, d)
      .withColumn("n_10m", count(lit(1)).over(w).cast("long"))
      .withColumn("sum_units_10m", sum(units(col("value"), 2)).over(w))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("n_10m"),
        toDouble(col("sum_units_10m"), 2).as("sum_10m"))
      .orderBy("event_id")
  }

  /** Unpivot — the dual of [[qPivotCounts]] (SURVEY §2.2 wide↔long):
    * melt the per-user wide counts back to (user_id, event_type, n)
    * rows via Spark's native unpivot; the oracle reconstructs the long
    * form directly (zero-count cells are dropped by both, matching
    * unpivot's null/0 filter). */
  val qUnpivotCounts: QueryDef = QueryDef.sql(
    "q_events_unpivot",
    """SELECT user_id, event_type, COUNT(*) AS n
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val wide = ev(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
    wide.unpivot(
        Array(col("user_id")),
        Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
        "event_type", "n")
      .filter(col("n").isNotNull && col("n") > 0)
      .orderBy("user_id", "event_type")
  }

  /** Click→purchase attribution: every (click, purchase) pair of the
    * same user where the purchase lands within 30 minutes AFTER the
    * click — the batch face of the stream-stream interval join in
    * [[graft.streaming.EventStreams.clickPurchaseJoin]] (StreamingSpec
    * asserts the streaming join emits exactly these rows).
    *
    * Scale: an equi-join on `user_id` with the interval as a residual
    * predicate — shuffles both sides once on the user key, never
    * all-pairs; in streaming the same watermark bound caps the join
    * state at 30 minutes per side. */
  val qAttribution: QueryDef = QueryDef.sql(
    "q_events_attribution",
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM events c JOIN events p
      |  ON p.user_id = c.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts > c.ts AND epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
    val clicks = ev(s, d).filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("c_us"))
    val purchases = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_uid"),
        unix_micros(col("ts")).as("p_us"))
    clicks.join(purchases,
        col("user_id") === col("p_uid") &&
          col("p_us") > col("c_us") &&
          col("p_us") - col("c_us") <= 1800000000L)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (col("p_us") - col("c_us")).as("gap_us"))
      .orderBy("click_id", "purchase_id")
  }

  /** Cohort retention matrix — the classic product-analytics triangle:
    * users are cohorted by the ISO week of their FIRST event, then each
    * (cohort_week, weeks_since) cell counts the distinct users active
    * that many weeks after their cohort week.
    *
    * Scale: the per-user first week comes from a window min over the
    * `user_id` partitioning (one shuffle, co-partitioned with every
    * other per-user op), then the distinct triple + count is a second
    * shuffle on the cell key with map-side partial aggregation. No
    * broadcast anywhere — the user dimension grows with the corpus.
    * Weeks are exact integers (µs div 604800000000 floored in IEEE
    * double, identical in both engines below 2^53). */
  val qRetention: QueryDef = QueryDef.sql(
    "q_events_retention",
    """WITH d AS (
      |  SELECT user_id,
      |    CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT) AS week
      |  FROM events
      |), c AS (
      |  SELECT user_id, week,
      |    MIN(week) OVER (PARTITION BY user_id) AS cohort_week
      |  FROM d
      |)
      |SELECT cohort_week, week - cohort_week AS weeks_since,
      |  COUNT(*) AS n_users
      |FROM (SELECT DISTINCT user_id, cohort_week, week FROM c)
      |GROUP BY 1, 2
      |ORDER BY cohort_week, weeks_since""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
    ev(s, d)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(604800000000.0)).as("week"))
      .withColumn("cohort_week", min(col("week")).over(w))
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"))
      .distinct()
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** Time-series gap fill: hourly event counts per type with missing
    * hours materialized at zero over the global [min, max] hour span —
    * the densify step every downstream charting/forecast consumer
    * needs (sf0.01: 215 of 3600 grid cells are fills).
    *
    * Scale: the fact side is pre-aggregated to (type, hour) BEFORE the
    * grid join, so the left join moves one row per non-empty cell, not
    * one per event. The grid itself is distinct-types × a
    * `sequence()`-exploded hour range — its size is types·hours,
    * bounded by the time span, not the event count; the span comes
    * from a 1-row global agg (scalar, broadcast by AQE). */
  val qGapfill: QueryDef = QueryDef.sql(
    "q_events_gapfill",
    """WITH d AS (
      |  SELECT event_type,
      |    CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour_id,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), s AS (SELECT MIN(hour_id) AS lo, MAX(hour_id) AS hi FROM d),
      |g AS (
      |  SELECT t.event_type, gs.hour_id
      |  FROM (SELECT DISTINCT event_type FROM events) t
      |  CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hour_id FROM s) gs
      |)
      |SELECT g.event_type, g.hour_id, COALESCE(d.n_events, 0) AS n_events
      |FROM g LEFT JOIN d USING (event_type, hour_id)
      |ORDER BY event_type, hour_id""".stripMargin) { (s, d) =>
    val hours = ev(s, d)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(3600000000.0)).as("hour_id"))
    val byHour = hours.groupBy(col("event_type"), col("hour_id"))
      .agg(count(lit(1)).as("n_events"))
    val span = hours.agg(min(col("hour_id")).as("lo"), max(col("hour_id")).as("hi"))
    val grid = hours.select(col("event_type")).distinct()
      .crossJoin(span.select(explode(sequence(col("lo"), col("hi"))).as("hour_id")))
    grid.join(byHour, Seq("event_type", "hour_id"), "left")
      .select(col("event_type"), col("hour_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("event_type", "hour_id")
  }

  /** Equi-width histogram with data-derived bounds: 10 bins spanning
    * [min, max] of `value`, each with its row count and value mass.
    * Two passes — a scalar min/max, then one aggregation over the
    * binned fact — the standard shape for profiling a numeric column
    * you know nothing about.
    *
    * Scale: pass 1 reduces to ONE row (partial min/max per partition →
    * scalar), which rides a broadcast into the binning expression; pass
    * 2 is a single groupBy shuffle on the bin id (≤10 groups, map-side
    * combined). Bin math happens on exact integer cent units; the
    * double division is exact-integer-in/IEEE-out, identical in both
    * engines. */
  val qHistogram: QueryDef = QueryDef.sql(
    "q_events_histogram",
    """WITH u AS (
      |  SELECT CAST(ROUND(value * 100.0) AS BIGINT) AS v FROM events
      |), s AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM u)
      |SELECT CAST(floor((v - mn) * 10.0 / (mx - mn + 1)) AS INTEGER) AS bin,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(v) AS DOUBLE) / 100.0 AS sum_value
      |FROM u CROSS JOIN s
      |GROUP BY 1
      |ORDER BY bin""".stripMargin) { (s, d) =>
    val u = ev(s, d).select(units(col("value"), 2).as("v"))
    val stats = u.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    u.crossJoin(broadcast(stats))
      .select(floor((col("v") - col("mn")) * lit(10.0) /
          (col("mx") - col("mn") + lit(1L))).cast(IntegerType).as("bin"),
        col("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_events"), toDouble(sum(col("v")), 2).as("sum_value"))
      .orderBy("bin")
  }

  /** Trailing 7-day active purchasers per day (rolling WAU) — the
    * sliding-window DISTINCT that `rangeBetween` cannot express
    * (count distinct isn't an associative window aggregate). Shape:
    * distinct (user, day) pairs each FAN OUT to the ≤7 report days
    * they support, then one count-distinct per report day — linear in
    * activity × window length, never a per-day rescan.
    *
    * Scale: the fan-out multiplies the (already per-day-deduped)
    * activity table by 7, then a single shuffle on the report day with
    * partial distinct aggregation; the [lo, hi] span guard is a scalar
    * broadcast. No ordering, no global window, no state. */
  val qWau: QueryDef = QueryDef.sql(
    "q_events_wau",
    """WITH du AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day
      |  FROM events WHERE event_type = 'purchase'
      |), s AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM du),
      |c AS (
      |  SELECT user_id, day + o.off AS day_r
      |  FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
      |)
      |SELECT day_r AS day, COUNT(DISTINCT user_id) AS wau
      |FROM c CROSS JOIN s
      |WHERE day_r BETWEEN lo AND hi
      |GROUP BY 1
      |ORDER BY day""".stripMargin) { (s, d) =>
    val du = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000.0)).as("day"))
      .distinct()
    val span = du.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    du.select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(6L))).as("day_r"))
      .crossJoin(broadcast(span))
      .filter(col("day_r").between(col("lo"), col("hi")))
      .groupBy(col("day_r"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(col("day_r").as("day"), col("wau"))
      .orderBy("day")
  }

  /** SCD Type-2 build: event-source each user's stream into state
    * intervals — every event opens a state valid [ts, next event's ts);
    * the latest state per user stays open (valid_to NULL, is_current).
    * The warehouse dimension-versioning shape, built with one
    * lead() over the per-user ordering.
    *
    * Scale: one shuffle on `user_id` (the window partitioning), then
    * pure projection — interval endpoints are exact µs BIGINTs and the
    * open-ended interval is a real NULL, so downstream as-of joins can
    * use the standard `valid_from <= t AND (t < valid_to OR valid_to
    * IS NULL)` probe. */
  val qScd2: QueryDef = QueryDef.sql(
    "q_events_scd2",
    """SELECT user_id, event_type AS state,
      |  epoch_us(ts) AS valid_from_us,
      |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS valid_to_us,
      |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    IS NULL AS is_current
      |FROM events
      |ORDER BY user_id, valid_from_us""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .select(col("user_id"), col("event_type").as("state"),
        unix_micros(col("ts")).as("valid_from_us"),
        lead(unix_micros(col("ts")), 1).over(w).as("valid_to_us"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .orderBy("user_id", "valid_from_us")
  }

  /** Time-weighted average (TWAP) of `value` per user: each event's
    * value holds until the user's next event; the mean weights each
    * held value by its µs duration. The metering/pricing aggregate a
    * last-value-carried-forward feed needs (a plain AVG overweights
    * bursts). Open-ended final states carry no duration.
    *
    * Scale: the same single user-partitioned window as [[qScd2]], then
    * one aggregation — weighted sums are exact BIGINT (cent-units × µs
    * < 2^63 for century-scale horizons) and the final division is
    * IEEE-over-exact-integers. */
  val qTwap: QueryDef = QueryDef.sql(
    "q_events_twap",
    """WITH iv AS (
      |  SELECT user_id,
      |    CAST(ROUND(value * 100.0) AS BIGINT) AS v,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      - epoch_us(ts) AS dur_us
      |  FROM events
      |)
      |SELECT user_id, COUNT(*) AS n_intervals,
      |  CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us,
      |  CAST(SUM(v * dur_us) AS DOUBLE) / CAST(SUM(dur_us) AS DOUBLE) / 100.0 AS twap
      |FROM iv WHERE dur_us IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .select(col("user_id"), units(col("value"), 2).as("v"),
        (lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts"))).as("dur_us"))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("sum_dur_us"),
        (sum(col("v") * col("dur_us")).cast("double") /
          sum(col("dur_us")).cast("double") / lit(100.0)).as("twap"))
      .orderBy("user_id")
  }

  /** [[qAsOfSignup]]'s semantics through the NATIVE as-of operator
    * ([[graft.plans.AsOfJoinPlan]] — logical node + strategy + single-
    * pass merge exec, SURVEY §4's whole-operator tier): purchases as-of
    * joined backward to signups on the user key. Same DuckDB oracle as
    * the composed window form — the two faces must hash-match.
    *
    * Scale: two key shuffles + in-partition sorts feed a merge cursor
    * holding ONE candidate row — no window blob over the union, no
    * inequality-join replay. (µs ties between a purchase and a signup
    * would differ from the window face's (ts, event_id) order; the
    * event stream is µs-resolution with no cross-type ties.) */
  val qAsOfNative: QueryDef = QueryDef.sql(
    "q_events_asof_native",
    qAsOfSignup.oracle.get) { (s, d) =>
    val purchases = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val signups = ev(s, d).filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    graft.plans.AsOfJoinOps
      .asofBackward(purchases, signups, "user_id", "user_id", "t_us", "t_us", "event_id")
      .filter(col("t_us_r").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("t_us").as("purchase_us"),
        col("t_us_r").as("signup_us"),
        (col("t_us") - col("t_us_r")).as("wait_us"))
      .orderBy("event_id")
  }

  /** FORWARD as-of through the native operator: each signup's NEXT
    * purchase (smallest purchase time ≥ the signup time) — time-to-
    * first-conversion, the mirror of [[qAsOfNative]]. The oracle is the
    * forward window form: first non-null purchase time over the
    * following frame of the (ts, event_id)-ordered per-user stream.
    * (Cross-type µs ties would order differently in the window — the
    * event stream has none; same pin as [[qAsOfNative]].)
    *
    * Scale: same native shape — two key shuffles, in-partition sorts
    * (time DESCENDING for the forward sweep), one-candidate merge. */
  val qAsOfForward: QueryDef = QueryDef.sql(
    "q_events_asof_fwd",
    """SELECT event_id, user_id,
      |  signup_us,
      |  next_purchase_us,
      |  next_purchase_us - signup_us AS lead_us
      |FROM (
      |  SELECT event_id, user_id, event_type,
      |    epoch_us(ts) AS signup_us,
      |    first_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_us
      |  FROM events
      |)
      |WHERE event_type = 'signup' AND next_purchase_us IS NOT NULL
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val signups = ev(s, d).filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val purchases = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    graft.plans.AsOfJoinOps
      .asof(signups, purchases, "user_id", "user_id", "t_us", "t_us", "event_id",
        direction = graft.plans.AsOfDirection.Forward)
      .filter(col("t_us_r").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("t_us").as("signup_us"),
        col("t_us_r").as("next_purchase_us"),
        (col("t_us_r") - col("t_us")).as("lead_us"))
      .orderBy("event_id")
  }

  /** NEAREST as-of through the native operator, with a tolerance: each
    * signup's closest purchase in absolute time distance (either
    * direction; distance ties prefer the backward side), nulled when
    * the closest is farther than 24 h. The oracle is the two-window
    * form — last not-later purchase time and first not-earlier purchase
    * time per (ts, event_id)-ordered user stream, then the nearer
    * WITHIN-tolerance side chosen by the native operator's preference
    * (nearer-in-bound wins; an out-of-bound nearer side yields to an
    * in-bound farther side). Only matched TIMES are output, so an
    * equal-time purchase is tie-robust regardless of which window side
    * it lands on. (Cross-type µs ties would order differently in the
    * window — the event stream has none; same pin as [[qAsOfNative]].)
    *
    * Scale: same native shape as [[qAsOfNative]] — two key shuffles,
    * in-partition sorts, one-candidate merge cursor whose look-ahead
    * row doubles as the forward candidate; the oracle's window blob
    * over the unioned stream is exactly what the operator avoids. */
  val qAsOfNearest: QueryDef = {
    val TolUs = 24L * 3600 * 1000000 // 24 h
    QueryDef.sql(
      "q_events_asof_nearest",
      s"""SELECT event_id, user_id, signup_us, nearest_purchase_us,
         |  ABS(nearest_purchase_us - signup_us) AS dist_us
         |FROM (
         |  SELECT event_id, user_id, event_type, signup_us,
         |    CASE WHEN prev_us IS NOT NULL AND signup_us - prev_us <= $TolUs
         |           AND (next_us IS NULL OR next_us - signup_us > $TolUs
         |                OR signup_us - prev_us <= next_us - signup_us)
         |         THEN prev_us
         |         WHEN next_us IS NOT NULL AND next_us - signup_us <= $TolUs
         |         THEN next_us
         |    END AS nearest_purchase_us
         |  FROM (
         |    SELECT event_id, user_id, event_type,
         |      epoch_us(ts) AS signup_us,
         |      last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
         |        OVER (PARTITION BY user_id ORDER BY ts, event_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
         |      first_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
         |        OVER (PARTITION BY user_id ORDER BY ts, event_id
         |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
         |    FROM events
         |  )
         |)
         |WHERE event_type = 'signup' AND nearest_purchase_us IS NOT NULL
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val signups = ev(s, d).filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
      val purchases = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
      graft.plans.AsOfJoinOps
        .asof(signups, purchases, "user_id", "user_id", "t_us", "t_us", "event_id",
          direction = graft.plans.AsOfDirection.Nearest, toleranceUs = Some(TolUs))
        .filter(col("t_us_r").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("t_us").as("signup_us"),
          col("t_us_r").as("nearest_purchase_us"),
          abs(col("t_us_r") - col("t_us")).as("dist_us"))
        .orderBy("event_id")
    }
  }

  /** Per-group z-score OUTLIER detection (the monitoring primitive for
    * a metrics/anomaly pipeline): events whose value sits more than 3
    * sample standard deviations from their event type's mean.
    *
    * Determinism: the group moments are ORDER-FREE exact-integer sums
    * (Σv, Σv² in cent units — both < 2⁵³, so their DOUBLE casts are
    * exact), and everything after is a fixed-shape chain of scalar
    * IEEE ops (two divisions, one mandated-correctly-rounded sqrt),
    * identical on both engines — no corpus-order-dependent float
    * summation anywhere. The mean is materialized ONCE in a stage and
    * reused so both engines round it identically; groups with
    * non-positive float variance are dropped BEFORE sqrt (guards the
    * NaN-comparison divergence between engines).
    *
    * Scale: one map-side-combined shuffle for the 5-row moment table
    * (bounded by the event-type vocabulary — the legitimate broadcast),
    * then a narrow per-row filter over the fact scan. */
  val qOutliers: QueryDef = QueryDef.sql(
    "q_events_outliers",
    """WITH s AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS su,
      |    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)
      |           * CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS sq
      |  FROM events GROUP BY event_type
      |), m AS (
      |  SELECT event_type, n, sq, CAST(su AS DOUBLE) / CAST(n AS DOUBLE) AS mean
      |  FROM s WHERE n > 1
      |), v AS (
      |  SELECT event_type, mean,
      |    (CAST(sq AS DOUBLE) - CAST(n AS DOUBLE) * mean * mean) / CAST(n - 1 AS DOUBLE) AS var
      |  FROM m
      |), st AS (
      |  SELECT event_type, mean, sqrt(var) AS sd FROM v WHERE var > 0
      |)
      |SELECT event_id, e.event_type, value,
      |  (CAST(CAST(ROUND(value * 100.0) AS BIGINT) AS DOUBLE) - mean) / sd AS z
      |FROM events e JOIN st ON st.event_type = e.event_type
      |WHERE ABS((CAST(CAST(ROUND(value * 100.0) AS BIGINT) AS DOUBLE) - mean) / sd) > 3.0
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val vu = units(col("value"), 2)
    val moments = ev(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(vu).cast("long").as("su"),
        sum(vu * vu).cast("long").as("sq"))
      .filter(col("n") > 1)
      .withColumn("mean", col("su").cast("double") / col("n").cast("double"))
      .withColumn("var",
        (col("sq").cast("double") - col("n").cast("double") * col("mean") * col("mean")) /
          (col("n") - 1).cast("double"))
      .filter(col("var") > 0)
      .select(col("event_type"), col("mean"), sqrt(col("var")).as("sd"))
    val z = (vu.cast("double") - col("mean")) / col("sd")
    ev(s, d).join(broadcast(moments), Seq("event_type"))
      .filter(abs(z) > 3.0)
      .select(col("event_id"), col("event_type"), col("value"), z.as("z"))
      .orderBy("event_id")
  }

  /** Hourly OHLC (open/high/low/close) downsample bars per event type —
    * the standard time-series resample. Open/close are selected by
    * `(ts, event_id)` order (unique tie-break per the QueryDef
    * determinism contract); only selection and min/max touch the double
    * column, no order-dependent summation.
    *
    * Scale: both row_number windows and the final aggregate partition by
    * `(event_type, hour)` — fine-grained keys, one shuffle, no global
    * window. */
  val qOhlc: QueryDef = QueryDef.sql(
    "q_events_ohlc",
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr, value,
      |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
      |                       ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
      |                       ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM events
      |)
      |SELECT event_type, CAST(epoch(hr) AS BIGINT) AS hr_s,
      |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
      |  MAX(value) AS high, MIN(value) AS low,
      |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
      |  COUNT(*) AS n_events
      |FROM e GROUP BY event_type, hr
      |ORDER BY event_type, hr_s""".stripMargin) { (s, d) =>
    val hr = date_trunc("hour", col("ts"))
    val wA = Window.partitionBy(col("event_type"), col("hr"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wD = Window.partitionBy(col("event_type"), col("hr"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev(s, d)
      .withColumn("hr", hr)
      .withColumn("rn_a", row_number().over(wA))
      .withColumn("rn_d", row_number().over(wD))
      .groupBy(col("event_type"), col("hr"))
      .agg(max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("hr").cast("long").as("hr_s"),
        col("open"), col("high"), col("low"), col("close"), col("n_events"))
      .orderBy("event_type", "hr_s")
  }

  /** Exact interpolated percentiles of `value` per event type — Spark's
    * exact `percentile` aggregate against DuckDB's `quantile_cont`
    * (both are the standard linear-interpolation definition at
    * position (n−1)·q; the driver's 9-decimal canonical rounding
    * absorbs last-ULP formula differences).
    *
    * Scale: exact percentile shuffles the values of each group to one
    * reducer — fine for bounded groups (5 event types × a value column);
    * the unbounded-cardinality form is `approx_percentile` (t-digest,
    * mergeable map-side) which the same query shape accepts. */
  val qPercentiles: QueryDef = QueryDef.sql(
    "q_events_percentiles",
    """SELECT event_type,
      |  quantile_cont(value, 0.25) AS p25,
      |  quantile_cont(value, 0.5)  AS p50,
      |  quantile_cont(value, 0.75) AS p75,
      |  quantile_cont(value, 0.95) AS p95
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    ev(s, d).groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.75)").as("p75"),
        expr("percentile(value, 0.95)").as("p95"))
      .orderBy("event_type")
  }

  /** Above-mean counts per event type computed through a SALTED fact⋈dim
    * join ([[SkewOps.saltedJoin]], salt=16): the oracle is the plain
    * join — salting must be result-invariant, and this query makes that
    * invariant an oracle-checked row rather than a unit test only.
    * All comparisons are exact-integer (value in 10⁻²-units × count vs
    * unit-sum), so the two-sided agg is order-independent.
    *
    * Scale: this is THE mitigation for a pathological key that AQE's
    * skew split can't fix (one event_type with 10⁹ rows): the fact side
    * scatters across 16 sub-keys, the 5-row dim replicates 16×, and the
    * hot key's rows spread over 16 reducers. */
  val qSaltedAgg: QueryDef = QueryDef.sql(
    "q_events_salted_agg",
    s"""WITH dim AS (
       |  SELECT event_type, SUM(${unitsSql("value", 2)}) AS sum_u, COUNT(*) AS cnt
       |  FROM events GROUP BY event_type
       |)
       |SELECT e.event_type,
       |  CAST(SUM(CASE WHEN ${unitsSql("e.value", 2)} * d.cnt > d.sum_u THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       |  COUNT(*) AS n_total
       |FROM events e JOIN dim d USING (event_type)
       |GROUP BY e.event_type
       |ORDER BY e.event_type""".stripMargin) { (s, d) =>
    val dim = ev(s, d).groupBy(col("event_type"))
      .agg(sum(units(col("value"), 2)).as("sum_u"), count(lit(1)).as("cnt"))
    SkewOps.saltedJoin(ev(s, d), dim, "event_type", salt = 16)
      .groupBy(col("event_type"))
      .agg(sum(when(units(col("value"), 2) * col("cnt") > col("sum_u"), 1).otherwise(0)).as("n_above"),
        count(lit(1)).as("n_total"))
      .orderBy("event_type")
  }

  /** approx_percentile at scale (§2.5's sketch tier, same cross-engine
    * contract as q_approx_distinct): sketches differ between engines, so
    * the hash-checked claim is the ESTIMATE-VS-EXACT bound — the
    * t-digest-style median (accuracy 1000 → ≤ 0.1 percentile-rank
    * error) must land within 5% of the exact interpolated median. A
    * sketch regression flips the boolean and fails the compare.
    *
    * Scale: approx_percentile is the UNBOUNDED-group form of
    * q_events_percentiles — mergeable map-side partial sketches, no
    * per-group value shuffle. */
  val qPercentilesApprox: QueryDef = QueryDef.sql(
    "q_events_percentiles_approx",
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50_exact,
      |  true AS within_5pct
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    ev(s, d).groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50_exact"),
        expr("approx_percentile(value, 0.5, 1000)").as("p50_approx"))
      .select(col("event_type"), col("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <=
          abs(col("p50_exact")) * 0.05).as("within_5pct"))
      .orderBy("event_type")
  }

  /** Robust outlier summary — median/MAD instead of mean/σ, the
    * estimator that survives the very outliers it hunts ([[qOutliers]]'
    * 3σ z-score moves with contamination; the median breakdown point is
    * 50%). Per type: exact interpolated median, MAD (median absolute
    * deviation, second percentile pass over |v − med|), and the count
    * beyond the 3·1.4826·MAD fence (1.4826 ≈ 1/Φ⁻¹(3/4) scales MAD to
    * σ-equivalent units).
    *
    * Determinism: median/MAD parity is the same interpolated-percentile
    * contract [[qPercentiles]] pins; the fence comparison is a
    * fixed-shape IEEE chain ((3.0·1.4826)·mad, left-assoc both
    * engines).
    *
    * Scale: the med/MAD tables are bounded by |event_type| → both
    * re-join passes broadcast; exact per-group percentiles shuffle the
    * group's values (the documented exact tier — approx_percentile in
    * [[qPercentilesApprox]] is the stated unbounded-group form). */
  val qRobustOutliers: QueryDef = QueryDef.sql(
    "q_events_robust",
    """WITH m AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type
      |), a AS (
      |  SELECT e.event_type, med, quantile_cont(ABS(value - med), 0.5) AS mad
      |  FROM events e JOIN m ON m.event_type = e.event_type
      |  GROUP BY e.event_type, med
      |)
      |SELECT e.event_type, med, mad,
      |  COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN ABS(value - med) > 3.0 * 1.4826 * mad
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN a ON a.event_type = e.event_type
      |WHERE mad > 0
      |GROUP BY e.event_type, med, mad
      |ORDER BY e.event_type""".stripMargin) { (s, d) =>
    val med = ev(s, d).groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = ev(s, d).join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), col("med"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      .filter(col("mad") > 0)
    ev(s, d).join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(abs(col("value") - col("med")) >
          lit(3.0) * lit(1.4826) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("med"), col("mad"),
        col("n_total"), col("n_outliers"))
      .orderBy("event_type")
  }

  /** Correlation / regression aggregates (§2.5 bivariate tier): per
    * event type, Pearson r and OLS slope of value (exact cents) against
    * hour-of-day. Built-in `corr`/`regr_slope` accumulate doubles in a
    * partition-order-dependent way, so the cross-engine contract is
    * instead the MOMENT-SUM form: six exact BIGINT sums (n, Σx, Σy,
    * Σx², Σy², Σxy — order-independent integer aggregation) feed one
    * fixed-shape IEEE chain, identical expression tree in both engines
    * (the q_events_outliers determinism pattern). The n·Σxx products run
    * in DOUBLE so the chain never depends on engine-specific BIGINT
    * overflow behavior at scale. Zero-variance groups emit NULL in both
    * engines. One map-side-combined shuffle on event_type. */
  val qCorr: QueryDef = QueryDef.sql(
    "q_events_corr",
    """WITH m AS (
      |  SELECT event_type,
      |    COUNT(*) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      |  FROM (
      |    SELECT event_type,
      |      CAST(ROUND(value * 100.0) AS BIGINT) AS x,
      |      CAST(hour(ts) AS BIGINT) AS y
      |    FROM events
      |  )
      |  GROUP BY event_type
      |)
      |SELECT event_type, n,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0.0
      |         OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0.0
      |       THEN NULL
      |       ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |            / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |               * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  END AS corr_value_hour,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0.0
      |       THEN NULL
      |       ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
      |  END AS slope_cents_per_hour
      |FROM m
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val x = units(col("value"), 2)
    val y = hour(col("ts")).cast("long")
    val m = ev(s, d)
      .select(col("event_type"), x.as("x"), y.as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    def dbl(c: String) = col(c).cast("double")
    val varx = dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")
    val vary = dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")
    val cov = dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")
    m.select(col("event_type"), col("n"),
        when(varx <= 0.0 || vary <= 0.0, lit(null).cast("double"))
          .otherwise(cov / (sqrt(varx) * sqrt(vary))).as("corr_value_hour"),
        when(vary <= 0.0, lit(null).cast("double"))
          .otherwise(cov / vary).as("slope_cents_per_hour"))
      .orderBy("event_type")
  }

  /** IGNORE NULLS window carry-forward (§2.6's null-skipping value
    * tier): each event sees the LAST PURCHASE value at-or-before it —
    * `last_value(x IGNORE NULLS)` over a running ROWS frame, the LVCF
    * idiom feature stores use for "most recent observation as of t"
    * (q_events_twap carries intervals; this carries per-row). Nulls
    * are woven by typing: non-purchase rows contribute NULL. Exact
    * cents; unique (ts, event_id) ordering; output cut to the user_id
    * % 20 = 0 cohort to stay presentation-bounded while every
    * partition computes. */
  val qWindowIgnoreNulls: QueryDef = QueryDef.sql(
    "q_events_carry",
    """SELECT user_id, event_id, event_type,
      |  last_value(pv IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_cents
      |FROM (
      |  SELECT user_id, event_id, event_type, ts,
      |    CASE WHEN event_type = 'purchase'
      |         THEN CAST(ROUND(value * 100.0) AS BIGINT) END AS pv
      |  FROM events
      |)
      |QUALIFY user_id % 20 = 0
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .withColumn("pv",
        when(col("event_type") === "purchase", units(col("value"), 2)))
      .withColumn("carried_cents", last(col("pv"), ignoreNulls = true).over(w))
      .filter(col("user_id") % 20 === 0)
      .select("user_id", "event_id", "event_type", "carried_cents")
      .orderBy("user_id", "event_id")
  }

  /** ORDERED-FOLD aggregation — the sequential-recurrence family no
    * window frame can express: per-user EWMA with α=1/2
    * (ewmaₙ = (centsₙ + ewmaₙ₋₁)/2). Halving is DYADIC-exact in IEEE
    * doubles and cents are exact integers, so the fold is bit-identical
    * in both engines PROVIDED the order matches — which is the point:
    * Spark's collect_list has no order guarantee, so the rows are
    * collected as (ts_us, event_id, cents) structs and array_sort'd
    * before the fold (DuckDB side: `list(... ORDER BY ...)` +
    * list_reduce). The same shape carries any per-key recurrence —
    * compound interest, decaying counters, Kalman-style state.
    *
    * Scale: one shuffle on user_id; per-user state is that user's
    * event list — the same bound sessionization already carries. */
  val qEwma: QueryDef = QueryDef.sql(
    "q_events_ewma",
    """SELECT user_id,
      |  CAST(len(seq) AS BIGINT) AS n_events,
      |  list_reduce(list_prepend(0.0, seq), (acc, x) -> (acc + x) / 2.0) AS ewma_cents
      |FROM (
      |  SELECT user_id,
      |    list(CAST(CAST(ROUND(value * 100.0) AS BIGINT) AS DOUBLE)
      |         ORDER BY ts, event_id) AS seq
      |  FROM events
      |  GROUP BY user_id
      |)
      |WHERE user_id % 20 = 0
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val rowStruct = struct(
      unix_micros(col("ts")).as("t"), col("event_id").as("e"),
      units(col("value"), 2).cast("double").as("v"))
    ev(s, d)
      .filter(col("user_id") % 20 === 0)
      .groupBy(col("user_id"))
      .agg(collect_list(rowStruct).as("rows"))
      .select(col("user_id"),
        size(col("rows")).cast("long").as("n_events"),
        aggregate(
          transform(array_sort(col("rows")), r => r.getField("v")),
          lit(0.0),
          (acc, x) => (acc + x) / lit(2.0)).as("ewma_cents"))
      .orderBy("user_id")
  }

  /** Event-path transition matrix (the Markov-chain view of user
    * journeys): per-user lag() pairs each event with its predecessor
    * type, then the corpus-wide (prev → next) counts and per-prev-state
    * transition shares in exact basis points (n·10000 div row-total —
    * no IEEE). This is the "what do users do after X" analysis behind
    * funnel design, and the transition matrix a next-event model trains
    * on.
    *
    * Scale: one shuffle on user_id for the lag window (same contract
    * as every query in this file), then a map-side-combined count on
    * the (prev, next) pair — O(|types|²) output. The share window
    * partitions on prev_type (bounded states), never globally. */
  val qPaths: QueryDef = QueryDef.sql(
    "q_events_paths",
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events
      |), p AS (
      |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      |  FROM s WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2
      |)
      |SELECT prev_type, next_type, n,
      |  CAST(n * 10000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS share_bp
      |FROM p
      |ORDER BY prev_type, next_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = ev(s, d)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val wp = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("_tot", sum(col("n")).over(wp))
      .withColumn("share_bp", expr("n * 10000 div _tot"))
      .drop("_tot")
      .orderBy("prev_type", "next_type")
  }

  /** Regular-grid RESAMPLING with linear interpolation — the
    * time-series sibling of [[qGapfill]]'s carry-forward: each user's
    * irregular event series is evaluated on a 6-hour grid, every grid
    * instant interpolated between its surrounding events
    * (v0 + (v1−v0)·(t−t0)/(t1−t0) — one fixed-shape IEEE chain over
    * exact epoch-µs/cent integers, so both engines bit-agree). Grid
    * points before the first or after the last event emit nothing
    * (interpolation, not extrapolation); an event exactly on the grid
    * reproduces its own value. Same-timestamp events collapse
    * deterministically to the max-event_id row first, so the
    * prev/next pairing never depends on sort-tie luck.
    *
    * Scale: the union-of-grid-and-events trick — ONE shuffle on
    * user_id orders events and grid points together, and two running
    * windows (back/forward) find the surrounding events without any
    * per-grid-point join against the series (the quadratic shape the
    * naive lateral join has). Grid size is bounded by span/step. */
  val qResample: QueryDef = QueryDef.sql(
    "q_events_resample",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS t,
      |    arg_max(CAST(ROUND(value * 100.0) AS BIGINT), event_id) AS vc
      |  FROM events WHERE value IS NOT NULL
      |  GROUP BY user_id, epoch_us(ts)
      |), b AS (
      |  SELECT user_id, MIN(t) AS mn, MAX(t) AS mx FROM e GROUP BY user_id
      |), g AS (
      |  SELECT user_id,
      |    UNNEST(range(((mn + 21599999999) // 21600000000) * 21600000000,
      |                 mx + 1, 21600000000)) AS t
      |  FROM b
      |  WHERE ((mn + 21599999999) // 21600000000) * 21600000000 <= mx
      |), u AS (
      |  SELECT user_id, t, vc, 1 AS is_event FROM e
      |  UNION ALL
      |  SELECT user_id, t, NULL, 0 FROM g
      |), w AS (
      |  SELECT user_id, t, is_event,
      |    last_value(CASE WHEN is_event = 1 THEN t END IGNORE NULLS) OVER win_b AS t0,
      |    last_value(CASE WHEN is_event = 1 THEN vc END IGNORE NULLS) OVER win_b AS v0,
      |    first_value(CASE WHEN is_event = 1 THEN t END IGNORE NULLS) OVER win_f AS t1,
      |    first_value(CASE WHEN is_event = 1 THEN vc END IGNORE NULLS) OVER win_f AS v1
      |  FROM u
      |  WINDOW
      |    win_b AS (PARTITION BY user_id ORDER BY t, is_event DESC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    win_f AS (PARTITION BY user_id ORDER BY t, is_event DESC
      |              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id, t AS grid_us,
      |  CAST(v0 AS DOUBLE) / 100 +
      |    CAST(v1 - v0 AS DOUBLE) * CAST(t - t0 AS DOUBLE)
      |      / CAST(t1 - t0 AS DOUBLE) / 100 AS value_interp
      |FROM w
      |WHERE is_event = 0 AND t0 IS NOT NULL AND t1 IS NOT NULL
      |ORDER BY user_id, grid_us""".stripMargin) { (s, d) =>
    val stepUs = 21600000000L // 6 hours
    val e = ev(s, d).filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        units(col("value"), 2).as("vc"), col("event_id"))
      .groupBy("user_id", "t")
      .agg(expr("max_by(vc, event_id)").as("vc"))
    val grid = e.groupBy("user_id")
      .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
      .withColumn("g0", expr(s"((mn + ${stepUs - 1}L) div ${stepUs}L) * ${stepUs}L"))
      .filter(col("g0") <= col("mx"))
      .select(col("user_id"),
        explode(sequence(col("g0"), col("mx"), lit(stepUs))).as("t"))
    val u = e.select(col("user_id"), col("t"), col("vc"), lit(1).as("is_event"))
      .unionByName(grid.select(col("user_id"), col("t"),
        lit(null).cast("long").as("vc"), lit(0).as("is_event")))
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_event").desc)
    val back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = order.rowsBetween(1, Window.unboundedFollowing)
    val evT = when(col("is_event") === 1, col("t"))
    val evV = when(col("is_event") === 1, col("vc"))
    u.withColumn("t0", last(evT, ignoreNulls = true).over(back))
      .withColumn("v0", last(evV, ignoreNulls = true).over(back))
      .withColumn("t1", first(evT, ignoreNulls = true).over(fwd))
      .withColumn("v1", first(evV, ignoreNulls = true).over(fwd))
      .filter(col("is_event") === 0 && col("t0").isNotNull && col("t1").isNotNull)
      .select(col("user_id"), col("t").as("grid_us"),
        (col("v0").cast("double") / 100.0 +
          (col("v1") - col("v0")).cast("double") * (col("t") - col("t0")).cast("double") /
            (col("t1") - col("t0")).cast("double") / 100.0).as("value_interp"))
      .orderBy("user_id", "grid_us")
  }

  /** WINSORIZED mean per event type — the trimmed-tail robust average
    * completing the robust tier (3σ fences in [[qOutliers]],
    * median/MAD in [[qRobustOutliers]]): values are clamped to the
    * per-group DISCRETE p05/p95 (the value at EXACT integer rank
    * ⌈q·n⌉ under a (cents, event_id) total order — no interpolation,
    * so the bounds are corpus values and cross-engine exact), then
    * averaged in exact cents with ONE final IEEE division. Clip
    * counts ride along — the telemetry-cleaning shape that tames
    * sensor spikes without the median's full information loss.
    *
    * Scale: one (type)-partitioned rank window (bounded per-type
    * groups) + one aggregate; the bounds table is O(types) and joins
    * back broadcast. */
  val qWinsorize: QueryDef = QueryDef.sql(
    "q_events_winsorize",
    """WITH c AS (
      |  SELECT event_type, event_id,
      |    CAST(ROUND(value * 100.0) AS BIGINT) AS cents
      |  FROM events
      |), r AS (
      |  SELECT event_type, cents,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM c
      |), b AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END) AS lo_cents,
      |    MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS hi_cents,
      |    CAST(MAX(n) AS BIGINT) AS n
      |  FROM r GROUP BY event_type
      |)
      |SELECT c.event_type, b.n, b.lo_cents, b.hi_cents,
      |  CAST(SUM(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
      |  CAST(SUM(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
      |  CAST(SUM(GREATEST(lo_cents, LEAST(hi_cents, cents))) AS DOUBLE)
      |    / (CAST(b.n AS DOUBLE) * 100.0) AS winsorized_mean
      |FROM c JOIN b ON c.event_type = b.event_type
      |GROUP BY c.event_type, b.n, b.lo_cents, b.hi_cents
      |ORDER BY c.event_type""".stripMargin) { (s, d) =>
    val c = ev(s, d).select(col("event_type"), col("event_id"),
      units(col("value"), 2).as("cents"))
    val byType = Window.partitionBy(col("event_type"))
    val r = c.select(col("event_type"), col("cents"),
      row_number().over(byType.orderBy(col("cents"), col("event_id"))).as("rn"),
      count(lit(1)).over(byType).as("n"))
    val b = r.groupBy("event_type").agg(
      max(when(col("rn") === expr("(5 * n + 99) div 100"), col("cents"))).as("lo_cents"),
      max(when(col("rn") === expr("(95 * n + 99) div 100"), col("cents"))).as("hi_cents"),
      max(col("n")).cast("long").as("n"))
    c.join(broadcast(b), "event_type")
      .groupBy("event_type", "n", "lo_cents", "hi_cents")
      .agg(
        sum(when(col("cents") < col("lo_cents"), 1).otherwise(0)).cast("long")
          .as("n_clipped_lo"),
        sum(when(col("cents") > col("hi_cents"), 1).otherwise(0)).cast("long")
          .as("n_clipped_hi"),
        (sum(greatest(col("lo_cents"), least(col("hi_cents"), col("cents"))))
          .cast("double") / (col("n").cast("double") * 100.0)).as("winsorized_mean"))
      .orderBy("event_type")
  }

  /** THEIL–SEN robust trend — the median of all pairwise slopes per
    * user (50% breakdown point vs [[qCorr]]'s OLS `regr_slope`, which
    * one spiked reading drags arbitrarily): each strict-time pair
    * contributes slope = Δcents·3.6e9µs / Δµs (exact longs, ONE IEEE
    * division), and the per-user estimate is the SELECTION median
    * (value at exact rank ⌈m/2⌉ under a (slope, pair ids) total
    * order — no averaging of middles, so the estimate is a computed
    * pair value and cross-engine exact). Same-timestamp pairs are
    * excluded (undefined slope).
    *
    * Scale: pair generation is a user-keyed self-join — per-user
    * quadratic is the algorithm's published cost, bounded by series
    * length (~40 here); the shuffle keys on user_id and no pair ever
    * crosses users. For long series, Theil–Sen is subsampled per key;
    * the shape is unchanged. */
  val qTheilSen: QueryDef = QueryDef.sql(
    "q_events_theilsen",
    """WITH c AS (
      |  SELECT user_id, event_id,
      |    CAST(epoch_us(ts) AS BIGINT) AS us,
      |    CAST(ROUND(value * 100.0) AS BIGINT) AS cents
      |  FROM events
      |), pr AS (
      |  SELECT a.user_id,
      |    CAST(b.cents - a.cents AS DOUBLE) * 3600000000.0
      |      / CAST(b.us - a.us AS DOUBLE) AS slope,
      |    a.event_id AS ea, b.event_id AS eb
      |  FROM c a JOIN c b
      |    ON a.user_id = b.user_id AND a.us < b.us
      |), r AS (
      |  SELECT user_id, slope,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slope, ea, eb) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS m
      |  FROM pr
      |)
      |SELECT user_id, CAST(MAX(m) AS BIGINT) AS n_pairs,
      |  MAX(CASE WHEN rn = (m + 1) // 2 THEN slope END) AS slope_cph
      |FROM r
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val c = ev(s, d).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), units(col("value"), 2).as("cents"))
    val pr = c.as("a").join(c.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.us") < col("b.us"))
      .select(col("a.user_id").as("user_id"),
        ((col("b.cents") - col("a.cents")).cast("double") * 3600000000.0
          / (col("b.us") - col("a.us")).cast("double")).as("slope"),
        col("a.event_id").as("ea"), col("b.event_id").as("eb"))
    val byUser = Window.partitionBy(col("user_id"))
    val r = pr.select(col("user_id"), col("slope"),
      row_number().over(byUser.orderBy(col("slope"), col("ea"), col("eb"))).as("rn"),
      count(lit(1)).over(byUser).as("m"))
    r.groupBy("user_id")
      .agg(max(col("m")).cast("long").as("n_pairs"),
        max(when(col("rn") === expr("(m + 1) div 2"), col("slope"))).as("slope_cph"))
      .orderBy("user_id")
  }

  /** CUSUM CHANGEPOINT detection — the monitoring question after
    * [[graft.queries.ProfileQueries]]' drift reports say "something
    * moved": WHERE did the level shift happen? The classic offline
    * CUSUM estimator over the hourly mean series: the changepoint is
    * the argmax of |Σ_{i≤t} m_i · N − t · Σm| (cumulative deviation
    * from the global mean, cross-multiplied to exact integers — no
    * division until the per-hour mean itself, which is pinned as a
    * flooring µ-cent div). A +500-cent level shift is WOVEN at the
    * 2024-01-21 cutoff, so the estimator has a true changepoint to
    * find; the before/after shift estimate and the detected verdict
    * ride along.
    *
    * Scale: one hour-bucket aggregate over the corpus, then all CUSUM
    * arithmetic on the O(hours) table (bounded global windows — the
    * q_drift_ks posture). */
  val qCusum: QueryDef = QueryDef.sql(
    "q_events_cusum",
    """WITH src AS (
      |  SELECT epoch_us(ts) // 3600000000 AS hr,
      |    CAST(ROUND(value * 100.0) AS BIGINT)
      |      + CASE WHEN epoch_us(ts) >= 1705795200000000 THEN 500 ELSE 0 END AS cents
      |  FROM events
      |), b AS (
      |  SELECT hr, CAST(SUM(cents) AS BIGINT) AS v, COUNT(*) AS c
      |  FROM src GROUP BY hr
      |), m AS (
      |  SELECT hr,
      |    ROW_NUMBER() OVER (ORDER BY hr) AS t,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS nn,
      |    CAST(SUM(v * 1000000 // c) OVER (ORDER BY hr) AS BIGINT) AS cum,
      |    CAST(SUM(v * 1000000 // c) OVER () AS BIGINT) AS tot
      |  FROM b
      |), cs AS (
      |  SELECT hr, ABS(cum * nn - t * tot) AS cstat, nn FROM m
      |), cp AS (
      |  SELECT CAST(MAX(nn) AS BIGINT) AS n_hours,
      |    MIN(CASE WHEN cstat = (SELECT MAX(cstat) FROM cs) THEN hr END) AS cp_hour
      |  FROM cs
      |)
      |SELECT n_hours, cp_hour,
      |  (SELECT CAST(SUM(cents) AS BIGINT) * 1000000
      |     // COUNT(*) FROM src WHERE hr > cp_hour)
      |  - (SELECT CAST(SUM(cents) AS BIGINT) * 1000000
      |     // COUNT(*) FROM src WHERE hr <= cp_hour) AS shift_micro,
      |  (SELECT CAST(SUM(cents) AS BIGINT) * 1000000
      |     // COUNT(*) FROM src WHERE hr > cp_hour)
      |  - (SELECT CAST(SUM(cents) AS BIGINT) * 1000000
      |     // COUNT(*) FROM src WHERE hr <= cp_hour) >= 100000000 AS detected
      |FROM cp""".stripMargin) { (s, d) =>
    val cutoffUs = 1705795200000000L
    val src = ev(s, d).select(
      // integer floor-div, NOT `/` (Column `/` on longs is IEEE division)
      expr("unix_micros(ts) div 3600000000").as("hr"),
      (units(col("value"), 2)
        + when(unix_micros(col("ts")) >= cutoffUs, 500L).otherwise(0L)).as("cents"))
    val b = src.groupBy("hr")
      .agg(sum(col("cents")).cast("long").as("v"), count(lit(1)).as("c"))
    // O(hours) table from here: bounded global windows, like q_drift_ks
    val byHr = Window.orderBy("hr")
    val m = b.select(col("hr"),
      row_number().over(byHr).as("t"),
      count(lit(1)).over(Window.partitionBy()).cast("long").as("nn"),
      sum(expr("v * 1000000 div c")).over(byHr).cast("long").as("cum"),
      sum(expr("v * 1000000 div c")).over(Window.partitionBy()).cast("long").as("tot"))
    val cs = m.select(col("hr"),
      abs(col("cum") * col("nn") - col("t") * col("tot")).as("cstat"), col("nn"))
    val mx = cs.agg(max(col("cstat")).as("mc"))
    val cp = cs.crossJoin(broadcast(mx))
      .agg(max(col("nn")).as("n_hours"),
        min(when(col("cstat") === col("mc"), col("hr"))).as("cp_hour"))
    val sides = src.crossJoin(broadcast(cp.select("cp_hour")))
      .agg(
        expr("sum(CASE WHEN hr > cp_hour THEN cents END) * 1000000"
          + " div count(CASE WHEN hr > cp_hour THEN 1 END)").as("after_micro"),
        expr("sum(CASE WHEN hr <= cp_hour THEN cents END) * 1000000"
          + " div count(CASE WHEN hr <= cp_hour THEN 1 END)").as("before_micro"))
    cp.crossJoin(broadcast(sides))
      .select(col("n_hours"), col("cp_hour"),
        (col("after_micro") - col("before_micro")).as("shift_micro"),
        (col("after_micro") - col("before_micro") >= 100000000L).as("detected"))
  }

  /** CHI-SQUARE independence test — the categorical hypothesis test
    * beside [[qCorr]]'s continuous association: is event_type
    * independent of the value tercile? χ² = Σ (O·T − R·C)² / (T·R·C)
    * over the contingency table, computed from EXACT integer counts
    * feeding a fixed-shape IEEE chain (the qCorr determinism recipe:
    * nothing but exact integers until the last arithmetic). Output:
    * the per-cell exact table margins, χ² and the verdict against the
    * α=0.01, dof=(5−1)(3−1)=8 critical value 20.09 — pinned as a
    * literal, the one piece a SQL engine can't derive.
    *
    * Scale: terciles come from two scalar thresholds (exact rank into
    * the value order — the winsorize primitive), then ONE contingency
    * aggregate over the corpus; everything after is O(cells). */
  val qChisq: QueryDef = QueryDef.sql(
    "q_events_chisq",
    """WITH c AS (
      |  SELECT event_type, CAST(ROUND(value * 100.0) AS BIGINT) AS cents, event_id
      |  FROM events
      |), r AS (
      |  SELECT event_type, cents,
      |    ROW_NUMBER() OVER (ORDER BY cents, event_id) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM c
      |), cls AS (
      |  SELECT event_type,
      |    CASE WHEN rn * 3 <= n THEN 0 WHEN rn * 3 <= 2 * n THEN 1 ELSE 2 END AS tercile
      |  FROM r
      |), o AS (
      |  SELECT event_type, tercile, COUNT(*) AS obs FROM cls GROUP BY 1, 2
      |), m AS (
      |  SELECT event_type, tercile, obs,
      |    CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
      |    CAST(SUM(obs) OVER (PARTITION BY tercile) AS BIGINT) AS col_n,
      |    CAST(SUM(obs) OVER () AS BIGINT) AS tot
      |  FROM o
      |), cells AS (
      |  SELECT event_type, tercile, tot,
      |    CAST((obs * tot - row_n * col_n) AS DOUBLE)
      |      * CAST((obs * tot - row_n * col_n) AS DOUBLE)
      |      / (CAST(tot AS DOUBLE) * CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE))
      |      AS cell
      |  FROM m
      |), chi AS (
      |  SELECT CAST(MIN(tot) AS BIGINT) AS n_events, COUNT(*) AS n_cells,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list(cell ORDER BY event_type, tercile)),
      |      (a, x) -> a + x) AS chi2
      |  FROM cells
      |)
      |SELECT n_events, n_cells, chi2, chi2 > 20.09 AS dependent FROM chi""".stripMargin) { (s, d) =>
    val c = ev(s, d).select(col("event_type"),
      units(col("value"), 2).as("cents"), col("event_id"))
    val r = c.select(col("event_type"), col("cents"),
      row_number().over(Window.orderBy(col("cents"), col("event_id"))).as("rn"),
      count(lit(1)).over(Window.partitionBy()).as("n"))
    val cls = r.select(col("event_type"),
      when(col("rn") * 3 <= col("n"), 0)
        .when(col("rn") * 3 <= col("n") * 2, 1).otherwise(2).as("tercile"))
    val o = cls.groupBy("event_type", "tercile").agg(count(lit(1)).as("obs"))
    val m = o.select(col("event_type"), col("tercile"), col("obs"),
      sum(col("obs")).over(Window.partitionBy("event_type")).cast("long").as("row_n"),
      sum(col("obs")).over(Window.partitionBy("tercile")).cast("long").as("col_n"),
      sum(col("obs")).over(Window.partitionBy()).cast("long").as("tot"))
    val dev = (col("obs") * col("tot") - col("row_n") * col("col_n")).cast("double")
    val cell = dev * dev /
      (col("tot").cast("double") * col("row_n").cast("double") * col("col_n").cast("double"))
    // the 15-cell total folds in (event_type, tercile) order — a plain
    // SUM over doubles is partition-order-dependent (the qEwma recipe)
    val folded = m.select(col("event_type"), col("tercile"), col("tot"), cell.as("cell"))
      .agg(min(col("tot")).cast("long").as("n_events"),
        count(lit(1)).as("n_cells"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("event_type"), col("tercile"), col("cell")))),
            x => x.getField("cell")),
          lit(0.0), (a, x) => a + x).as("chi2"))
    folded.select(col("n_events"), col("n_cells"), col("chi2"),
      (col("chi2") > 20.09).as("dependent"))
  }

  /** SEASONAL decomposition + deseasonalized outliers — the anomaly
    * question [[qOutliers]]' global 3σ fences get wrong on cyclic
    * data: an event is judged against its HOUR-OF-DAY baseline, not
    * the global mean (a 3am spike and a noon spike face different
    * references). The 24-row seasonal profile is exact flooring
    * µ-cents (sum·10⁶ div n per hod); residual = cents·10⁶ −
    * profile[hod], pure integers; the report is the top-10 by
    * |residual| with unique-key tie-break.
    *
    * Scale: one hod aggregate (24 groups, map-side combined), the
    * profile joins back as a 24-row broadcast, and the report is a
    * partial top-k — the corpus is scanned twice, shuffled never
    * (beyond the 24-row agg). */
  val qSeasonal: QueryDef = QueryDef.sql(
    "q_events_seasonal",
    """WITH c AS (
      |  SELECT event_id,
      |    (epoch_us(ts) // 3600000000) % 24 AS hod,
      |    CAST(ROUND(value * 100.0) AS BIGINT) AS cents
      |  FROM events
      |), p AS (
      |  SELECT hod,
      |    CAST(SUM(cents) AS BIGINT) * 1000000 // COUNT(*) AS mean_micro
      |  FROM c GROUP BY hod
      |)
      |SELECT c.event_id, c.hod, c.cents, p.mean_micro,
      |  c.cents * 1000000 - p.mean_micro AS residual_micro
      |FROM c JOIN p ON c.hod = p.hod
      |ORDER BY ABS(c.cents * 1000000 - p.mean_micro) DESC, c.event_id
      |LIMIT 10""".stripMargin) { (s, d) =>
    val c = ev(s, d).select(col("event_id"),
      expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
      units(col("value"), 2).as("cents"))
    val p = c.groupBy("hod")
      .agg(expr("sum(cents) * 1000000 div count(1)").as("mean_micro"))
    c.join(broadcast(p), "hod")
      .select(col("event_id"), col("hod"), col("cents"), col("mean_micro"),
        (col("cents") * 1000000L - col("mean_micro")).as("residual_micro"))
      .orderBy(abs(col("residual_micro")).desc, col("event_id"))
      .limit(10)
  }

  /** HOLT double-exponential smoothing (level + trend) — the
    * MULTI-STATE member of the ordered-fold family ([[qEwma]] carries
    * one state variable; this carries two coupled ones, the shape of
    * any Kalman-style recurrence): lₜ = (xₜ + (lₜ₋₁+bₜ₋₁))/2,
    * bₜ = ((lₜ−lₜ₋₁) + bₜ₋₁)/2 with dyadic α=β=1/2, one-step
    * forecast l+b. DuckDB's `list_reduce` folds T→T only, so BOTH
    * engines fold same-shape [l, b, seeded] DOUBLE arrays (elements
    * carry x in slot 1; a leading sentinel seeds l₀=x₀, b₀=0) —
    * identical arithmetic, identical order, bit-identical forecasts.
    * The state is an ARRAY, not a struct, deliberately: DuckDB 1.0
    * evaluates struct_pack fields sequentially INTO the accumulator,
    * so a struct state's second field reads the first field's
    * freshly-written value (observed: acc.l was already l₁ while
    * computing b) — list_value has no such in-place mutation.
    *
    * Scale: one user_id shuffle; per-key state is that key's ordered
    * list, the sessionization bound. */
  val qHolt: QueryDef = QueryDef.sql(
    "q_events_holt",
    """SELECT user_id,
      |  CAST(len(seq) AS BIGINT) AS n_events,
      |  st[1] AS level_cents, st[2] AS trend_cents,
      |  st[1] + st[2] AS forecast_cents
      |FROM (
      |  SELECT user_id, seq,
      |    list_reduce(
      |      list_prepend([CAST(0.0 AS DOUBLE), 0.0, 0.0],
      |        list_transform(seq, x -> [x, CAST(0.0 AS DOUBLE), 0.0])),
      |      (acc, e) -> CASE WHEN acc[3] = 0.0
      |        THEN [e[1], CAST(0.0 AS DOUBLE), 1.0]
      |        ELSE [(e[1] + acc[1] + acc[2]) / 2.0,
      |              (((e[1] + acc[1] + acc[2]) / 2.0 - acc[1]) + acc[2]) / 2.0,
      |              1.0] END) AS st
      |  FROM (
      |    SELECT user_id,
      |      list(CAST(CAST(ROUND(value * 100.0) AS BIGINT) AS DOUBLE)
      |           ORDER BY ts, event_id) AS seq
      |    FROM events
      |    GROUP BY user_id
      |  )
      |  WHERE user_id % 20 = 0
      |)
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val rowStruct = struct(
      unix_micros(col("ts")).as("t"), col("event_id").as("e"),
      units(col("value"), 2).cast("double").as("v"))
    ev(s, d)
      .filter(col("user_id") % 20 === 0)
      .groupBy(col("user_id"))
      .agg(collect_list(rowStruct).as("rows"))
      .select(col("user_id"),
        size(col("rows")).cast("long").as("n_events"),
        aggregate(
          transform(array_sort(col("rows")), r => r.getField("v")),
          array(lit(0.0), lit(0.0), lit(0.0)),
          (acc, x) => {
            val l0 = element_at(acc, 1); val b0 = element_at(acc, 2)
            val l1 = (x + l0 + b0) / lit(2.0)
            when(element_at(acc, 3) === 0.0, array(x, lit(0.0), lit(1.0)))
              .otherwise(array(l1, ((l1 - l0) + b0) / lit(2.0), lit(1.0)))
          }).as("st"))
      .select(col("user_id"), col("n_events"),
        element_at(col("st"), 1).as("level_cents"),
        element_at(col("st"), 2).as("trend_cents"),
        (element_at(col("st"), 1) + element_at(col("st"), 2)).as("forecast_cents"))
      .orderBy("user_id")
  }

  val all: Seq[QueryDef] = Seq(
    qTumbling, qLagGaps, qSessionize, qAsOfSignup,
    qPivotCounts, qJsonExtract, qFunnel, qSlidingRange, qHopping, qUnpivotCounts,
    qAttribution, qRetention, qGapfill, qHistogram, qWau, qScd2, qTwap, qAsOfNative,
    qAsOfForward, qAsOfNearest, qOutliers, qOhlc, qPercentiles, qSaltedAgg,
    qPercentilesApprox, qRobustOutliers, qCorr, qWindowIgnoreNulls, qEwma, qPaths,
    qResample, qWinsorize, qTheilSen, qCusum, qChisq, qSeasonal, qHolt)
}
