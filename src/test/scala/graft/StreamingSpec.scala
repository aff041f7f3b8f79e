package graft

import java.nio.file.Files

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private def ckpt() =
    Files.createTempDirectory("ckpt").toFile.getAbsolutePath

  /** The protocol requires `add.size` to be the ACTUAL byte length and
    * the reader plans splits from it — rewrite the fixture sites'
    * placeholder sizes to the real length of the referenced file. */
  private def sizedAction(dir: String, line: String): String =
    """"path":"([^"]+)"""".r.findFirstMatchIn(line) match {
      case Some(m) if line.contains("\"size\":") =>
        val rel = m.group(1)
        val f = if (new java.io.File(rel).isAbsolute) new java.io.File(rel)
        else new java.io.File(s"$dir/$rel")
        if (f.isFile)
          line.replaceFirst(""""size":\d+""", s""""size":${f.length}""")
        else line
      case _ => line
    }

  /** Write one fixture commit with honest add sizes. */
  private def writeDeltaLog(dir: String, v: Long, lines: Seq[String]): Unit = {
    new java.io.File(s"$dir/_delta_log").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_delta_log/" + f"$v%020d" + ".json"),
      lines.map(sizedAction(dir, _)).mkString("", "\n", "\n")): Unit
  }

  // the streaming file source wants a directory; stage the single
  // events.parquet file into one
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toFile.getAbsolutePath
  }

  test("streaming tumbling agg (availableNow) matches the batch query") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.tumblingCounts(stream), "t_tumbling", "append", ckpt())
    // append mode emits only watermark-closed windows; every emitted
    // window must match the batch result exactly
    val batch = queries.Events.qTumbling.run(spark, sf)
      .withColumnRenamed("n_events", "b_n").withColumnRenamed("sum_value", "b_sum")
    val joined = got.join(batch, Seq("bucket_s", "event_type"), "inner")
    assert(got.count() > 0)
    assert(joined.count() == got.count())
    assert(joined.filter(col("n_events") =!= col("b_n") ||
      col("sum_value") =!= col("b_sum")).count() == 0)
  }

  test("streaming sliding windows (availableNow) match the batch query") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.slidingCounts(stream), "t_sliding", "append", ckpt())
    val batch = queries.Events.qHopping.run(spark, sf)
      .withColumnRenamed("n_events", "b_n").withColumnRenamed("sum_value", "b_sum")
    val joined = got.join(batch, Seq("bucket_s", "event_type"), "inner")
    assert(got.count() > 0)
    assert(joined.count() == got.count())
    assert(joined.filter(col("n_events") =!= col("b_n") ||
      col("sum_value") =!= col("b_sum")).count() == 0)
  }

  test("streaming OHLC bars (availableNow) match the batch query") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.ohlcBars(stream), "t_ohlc", "append", ckpt())
    val batch = queries.Events.qOhlc.run(spark, sf)
      .withColumnRenamed("open", "b_open").withColumnRenamed("high", "b_high")
      .withColumnRenamed("low", "b_low").withColumnRenamed("close", "b_close")
      .withColumnRenamed("n_events", "b_n")
    val joined = got.join(batch, Seq("event_type", "hr_s"), "inner")
    assert(got.count() > 0)
    assert(joined.count() == got.count())
    // min_by/max_by selection must pick the same rows as the batch
    // row_number windows — doubles compare bit-exact (same source values)
    assert(joined.filter(col("open") =!= col("b_open") ||
      col("high") =!= col("b_high") || col("low") =!= col("b_low") ||
      col("close") =!= col("b_close") || col("n_events") =!= col("b_n")).count() == 0)
  }

  test("streaming session windows cover all events") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.sessionAgg(stream), "t_sessions", "append", ckpt())
    assert(got.count() > 0)
    // session windows partition each user's events: totals can't exceed
    // the full event count and every emitted session is non-empty
    assert(got.filter(col("n_events") <= 0).count() == 0)
  }

  test("flatMapGroupsWithState sessionization matches the batch sessionizer") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.customSessionize(stream).toDF(), "t_custom_sessions", "append", ckpt())
    assert(got.count() > 0)
    // append emits sessions closed by a later event PLUS trailing
    // sessions flushed by the availableNow end-of-stream timeout batch;
    // every emitted session must match a batch session exactly, and at
    // minimum all gap-closed (non-trailing) batch sessions must emit.
    val batch = queries.Events.qSessionize.run(spark, sf)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events").as("b_n"), col("sum_value").as("b_sum"))
    val joined = got.join(batch, Seq("user_id", "start_us", "end_us"), "inner")
    assert(joined.count() == got.count(),
      "every emitted session must equal a batch session")
    val wLast = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val nClosed = queries.Events.qSessionize.run(spark, sf)
      .withColumn("max_sid", max(col("session_id")).over(wLast))
      .filter(col("session_id") =!= col("max_sid")).count()
    assert(got.count() >= nClosed, "all gap-closed batch sessions must be emitted")
    assert(joined.filter(col("n_events") =!= col("b_n") ||
      col("sum_value") =!= col("b_sum")).count() == 0)
  }

  test("customSessionize merges cross-batch late events instead of shrinking the session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = EventStreams.customSessionize(
      input.toDF().toDF("user_id", "ts", "value")).toDF()
    val q = out.writeStream.format("memory").queryName("t_ooo_sessions")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      // batch 1: open session spanning [10:00, 10:10]
      input.addData((7L, ts("2023-01-01 10:00:00"), 1.0),
        (7L, ts("2023-01-01 10:10:00"), 1.0))
      q.processAllAvailable()
      // batch 2: late-but-within-watermark event INSIDE the open span —
      // before the min/max merge fix this shrank end_us to 10:05
      input.addData((7L, ts("2023-01-01 10:05:00"), 1.0))
      q.processAllAvailable()
      // batch 3: 31 min after the true end (10:10) closes the session; with
      // the shrunk end it would have mis-reported end_us = 10:05
      input.addData((7L, ts("2023-01-01 10:41:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("t_ooo_sessions")
        .select("user_id", "start_us", "end_us", "n_events", "sum_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      def us(s: String) = ts(s).getTime * 1000
      assert(rows == Seq((7L, us("2023-01-01 10:00:00"), us("2023-01-01 10:10:00"), 3L, 3.0)))
    } finally q.stop()
  }

  test("watermark drops too-late rows and ACCOUNTS for them in query progress") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val out = EventStreams.tumblingCounts(
      input.toDF().toDF("ts", "event_type", "value"))
    val q = out.writeStream.format("memory").queryName("t_late_acct")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      // batch 1: two rows in the 10:00 window + one at 12:00 that will
      // push the watermark to 11:30 (30-min delay), far past 10:10
      input.addData(
        (ts("2023-01-01 10:00:30"), "click", 1.0),
        (ts("2023-01-01 10:05:00"), "click", 1.0),
        (ts("2023-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()
      // batch 2: a row for the long-closed 10:00 window — beyond the
      // watermark, so it must be DROPPED and COUNTED, not silently lost
      input.addData((ts("2023-01-01 10:02:00"), "click", 9.0))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1, "the late row must be accounted in query progress")
      // the emitted 10:00 window carries only the two on-time rows
      val row = spark.table("t_late_acct")
        .filter(col("bucket_s") === ts("2023-01-01 10:00:00").getTime / 1000)
        .select("n_events", "sum_value").collect()
      assert(row.length == 1 && row.head.getLong(0) == 2L && row.head.getDouble(1) == 2.0)
    } finally q.stop()
  }

  test("streaming as-of emits exactly the batch as-of on watermark-final facts") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val facts = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("id"))
    val rights = stream.filter(col("event_type") === "signup")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("id"))
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.streamingAsOf(facts, rights).toDF(), "t_stream_asof", "append", ckpt())

    val ev = Tables(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "signup"))
    val wmUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0) - 30L * 60 * 1000000
    val bF = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("event_id"))
    val bR = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("event_id"))
    val batch = graft.plans.AsOfJoinOps
      .asof(bF, bR, "user_id", "user_id", "t_us", "t_us", "event_id")
      .filter(col("t_us") <= wmUs)
      .select(col("event_id").as("fact_id"), col("t_us").as("fact_us"),
        col("event_id_r").as("b_right_id"), col("t_us_r").as("b_right_us"))
    assert(got.count() > 0 && got.count() == batch.count(),
      "every watermark-final fact must emit exactly once")
    val joined = got.join(batch, Seq("fact_id"), "inner")
    assert(joined.count() == got.count())
    assert(joined.filter(
      col("right_id") <=> col("b_right_id") === false ||
      col("right_us") <=> col("b_right_us") === false).count() == 0,
      "every streamed match must equal the batch operator's match")
  }

  test("streaming as-of matches across micro-batches and prunes to the latest old right") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def us(s: String) = ts(s).getTime * 1000
    val fIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = EventStreams.streamingAsOf(
      fIn.toDF().toDF("key", "ts", "id"), rIn.toDF().toDF("key", "ts", "id")).toDF()
    val q = out.writeStream.format("memory").queryName("t_asof_batches")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      // batch 1: a right at 10:00 and a fact at 10:05 — wm still unset,
      // nothing may emit yet (an older right could still arrive)
      rIn.addData((7L, ts("2023-01-01 10:00:00"), 100L))
      fIn.addData((7L, ts("2023-01-01 10:05:00"), 1L), (8L, ts("2023-01-01 10:05:00"), 2L))
      q.processAllAvailable()
      // batch 2: 11:00 advances the watermark past 10:05 → fact 1 emits
      // matched to right 100; keyless fact 2 emits with nulls
      fIn.addData((7L, ts("2023-01-01 11:00:00"), 3L))
      q.processAllAvailable()
      // batch 3: a fresh right at 10:50 (inside the lag) then 12:00
      // advances the watermark past 11:00 → fact 3 must match right 101,
      // proving the pruned buffer still held what a later fact needs
      rIn.addData((7L, ts("2023-01-01 10:50:00"), 101L))
      fIn.addData((7L, ts("2023-01-01 12:00:00"), 4L))
      q.processAllAvailable()
      fIn.addData((7L, ts("2023-01-01 13:00:00"), 5L))
      q.processAllAvailable()
      val rows = spark.table("t_asof_batches")
        .select("key", "fact_id", "right_id", "right_us")
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(rows == Set(
        (7L, 1L, Some(100L), Some(us("2023-01-01 10:00:00"))),
        (8L, 2L, None, None),
        (7L, 3L, Some(101L), Some(us("2023-01-01 10:50:00"))),
        (7L, 4L, Some(101L), Some(us("2023-01-01 10:50:00")))),
        s"got: $rows")
    } finally q.stop()
  }

  test("streaming FORWARD as-of finalizes on candidate-passed watermark; better candidate can still win before it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def us(s: String) = ts(s).getTime * 1000
    val fIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = EventStreams.streamingAsOf(
      fIn.toDF().toDF("key", "ts", "id"), rIn.toDF().toDF("key", "ts", "id"),
      direction = graft.plans.AsOfDirection.Forward).toDF()
    val q = out.writeStream.format("memory").queryName("t_asof_fwd")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      // fact at 10:00 alone: nothing to match yet
      fIn.addData((7L, ts("2023-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      // two candidates arrive — 11:00 first in id order, then a NEARER
      // 10:40. The watermark (10:30 after this batch) has not passed
      // 10:40, so an even nearer candidate could still arrive: no emit
      rIn.addData((7L, ts("2023-01-01 11:00:00"), 200L), (7L, ts("2023-01-01 10:40:00"), 201L))
      q.processAllAvailable()
      assert(spark.table("t_asof_fwd").count() == 0,
        "must not emit before the watermark passes the forward candidate")
      // 11:20 advances the watermark to 10:50 > 10:40 → the fact
      // finalizes to the nearer 201, not the first-seen 200
      rIn.addData((7L, ts("2023-01-01 11:20:00"), 202L))
      q.processAllAvailable()
      val rows = spark.table("t_asof_fwd")
        .select("key", "fact_id", "right_id", "right_us")
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(rows == Set((7L, 1L, Some(201L), Some(us("2023-01-01 10:40:00")))),
        s"got: $rows")
    } finally q.stop()
  }

  test("streaming NEAREST as-of: backward lock + forward wait, distance finality, tolerance null") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def us(s: String) = ts(s).getTime * 1000
    val fIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = EventStreams.streamingAsOf(
      fIn.toDF().toDF("key", "ts", "id"), rIn.toDF().toDF("key", "ts", "id"),
      direction = graft.plans.AsOfDirection.Nearest,
      toleranceUs = Some(30L * 60 * 1000000)).toDF() // 30 min bound
    val q = out.writeStream.format("memory").queryName("t_asof_near")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      // key 7: backward right 10 min before the fact; key 9: no right
      // at all (tolerance must null it out eventually)
      rIn.addData((7L, ts("2023-01-01 09:50:00"), 300L))
      fIn.addData((7L, ts("2023-01-01 10:00:00"), 1L), (9L, ts("2023-01-01 10:00:00"), 2L))
      q.processAllAvailable()
      // wm at ~09:35: fact not even backward-locked yet
      assert(spark.table("t_asof_near").count() == 0)
      // advance wm past 10:10 = t + db → backward candidate (10 min)
      // beats any possible future arrival (> wm ⇒ > 10 min away)
      rIn.addData((7L, ts("2023-01-01 10:45:00"), 999L))
      q.processAllAvailable()
      val afterLock = spark.table("t_asof_near")
        .select("key", "fact_id", "right_id").as[(Long, Long, Option[Long])].collect().toSet
      assert(afterLock == Set((7L, 1L, Some(300L))), s"got: $afterLock")
      // advance wm past 10:30 = t + tolerance → key 9 emits null
      rIn.addData((7L, ts("2023-01-01 11:05:00"), 998L))
      q.processAllAvailable()
      val all = spark.table("t_asof_near")
        .select("key", "fact_id", "right_id", "right_us")
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(all == Set(
        (7L, 1L, Some(300L), Some(us("2023-01-01 09:50:00"))),
        (9L, 2L, None, None)), s"got: $all")
    } finally q.stop()
  }

  test("streaming NEAREST as-of: a closer forward candidate beats the locked backward one") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def us(s: String) = ts(s).getTime * 1000
    val fIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = EventStreams.streamingAsOf(
      fIn.toDF().toDF("key", "ts", "id"), rIn.toDF().toDF("key", "ts", "id"),
      direction = graft.plans.AsOfDirection.Nearest).toDF()
    val q = out.writeStream.format("memory").queryName("t_asof_near2")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      // backward at distance 20 min, forward at distance 5 min: the
      // fact may only finalize once wm ≥ t + 5 min, to the forward row
      rIn.addData((7L, ts("2023-01-01 09:40:00"), 400L))
      fIn.addData((7L, ts("2023-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      rIn.addData((7L, ts("2023-01-01 10:05:00"), 401L))
      q.processAllAvailable()
      assert(spark.table("t_asof_near2").count() == 0,
        "wm has not passed t + winning distance yet")
      rIn.addData((7L, ts("2023-01-01 10:40:00"), 402L))
      q.processAllAvailable()
      val rows = spark.table("t_asof_near2")
        .select("key", "fact_id", "right_id", "right_us")
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(rows == Set((7L, 1L, Some(401L), Some(us("2023-01-01 10:05:00")))),
        s"got: $rows")
    } finally q.stop()
  }

  test("streaming forward as-of (availableNow) equals the batch operator on direction-final facts") {
    val TolUs = 24L * 3600 * 1000000
    val stream = EventStreams.readStream(spark, eventsDir)
    val facts = stream.filter(col("event_type") === "signup")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("id"))
    val rights = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("id"))
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.streamingAsOf(facts, rights,
        direction = graft.plans.AsOfDirection.Forward, toleranceUs = Some(TolUs)).toDF(),
      "t_stream_asof_fwd", "append", ckpt())

    val ev = Tables(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "signup"))
    val wmUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0) - 30L * 60 * 1000000
    val bF = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("event_id"))
    val bR = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("event_id"))
    // direction-final facts: the UNBOUNDED forward candidate's time is
    // under the final watermark (the candidate can't improve — even if
    // it is beyond tolerance, null is then final), or the tolerance
    // horizon itself has passed
    val candTimes = graft.plans.AsOfJoinOps
      .asof(bF, bR, "user_id", "user_id", "t_us", "t_us", "event_id",
        direction = graft.plans.AsOfDirection.Forward)
      .select(col("event_id").as("fact_id"), col("t_us_r").as("cand_us"))
    val batch = graft.plans.AsOfJoinOps
      .asof(bF, bR, "user_id", "user_id", "t_us", "t_us", "event_id",
        direction = graft.plans.AsOfDirection.Forward, toleranceUs = Some(TolUs))
      .select(col("event_id").as("fact_id"), col("t_us").as("fact_us"),
        col("event_id_r").as("b_right_id"), col("t_us_r").as("b_right_us"))
      .join(candTimes, Seq("fact_id"))
      .filter((col("cand_us").isNotNull && col("cand_us") <= wmUs) ||
        (col("fact_us") + TolUs <= wmUs))
      .drop("cand_us")
    assert(got.count() > 0 && got.count() == batch.count(),
      s"every direction-final fact must emit exactly once: got ${got.count()} vs batch ${batch.count()}")
    val joined = got.join(batch, Seq("fact_id"), "inner")
    assert(joined.count() == got.count())
    assert(joined.filter(
      col("right_id") <=> col("b_right_id") === false ||
      col("right_us") <=> col("b_right_us") === false).count() == 0,
      "every streamed forward match must equal the batch operator's match")
  }

  test("streaming upsert into the partitioned vector store is idempotent") {
    val store = Files.createTempDirectory("vstore_stream").toFile.getAbsolutePath + "/store"
    def run(ck: String): Unit = {
      val stream = EventStreams.dedupEvents(EventStreams.readStream(spark, eventsDir))
        .select(col("event_id").cast("string").as("chunk_id"),
          col("event_type").as("payload"),
          to_date(col("ts")).as("load_dt"))
      EventStreams.upsertStream(stream, store, ck)
    }
    run(ckpt())
    val n1 = graft.sources.VectorStore.read(spark, store).count()
    val distinctIds = Tables(spark, sf, "events").select("event_id").distinct().count()
    assert(n1 == distinctIds)
    // a fresh checkpoint replays the whole source: the key-based upsert
    // must absorb the duplicates, not append them
    run(ckpt())
    assert(graft.sources.VectorStore.read(spark, store).count() == n1)
  }

  test("streaming incremental dedup matches the batch screen and is replay-idempotent") {
    // stream the whole documents table as "incoming"; history = the
    // doc_id % 10 < 8 slice (the q_dedup_incremental convention). Docs
    // already in history are exact dups of themselves, so the store must
    // end up with exactly the batch query's novel=1 set.
    val docsDir = {
      val dir = Files.createTempDirectory("docs_stream")
      Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("part-0.parquet"))
      dir.toFile.getAbsolutePath
    }
    val history = Tables(spark, sf, "documents").filter(col("doc_id") % 10 < 8)
    val store = Files.createTempDirectory("vstore_inc").toFile.getAbsolutePath + "/store"
    def run(ck: String): Unit = {
      val incoming = spark.readStream
        .schema(Tables(spark, sf, "documents").schema)
        .parquet(docsDir)
        .withColumn("chunk_id", col("doc_id").cast("string"))
      graft.streaming.IncrementalDedup.screenAndUpsertStream(incoming, history, store, ck)
    }
    run(ckpt())
    val got = graft.sources.VectorStore.read(spark, store)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val batchNovel = queries.DedupQueries.qDedupIncremental.run(spark, sf)
      .filter(col("novel") === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty, "some incoming docs must be novel vs history")
    assert(got == batchNovel,
      "streamed screen must admit exactly the batch query's novel set")
    // a fresh checkpoint replays the source; the keyed upsert absorbs it
    run(ckpt())
    assert(graft.sources.VectorStore.read(spark, store).count() == got.size)
  }

  test("streaming image screen admits exactly the batch perceptual-dup screen, replay-idempotent") {
    import graft.operators.MultimodalOps
    // fixture corpus: stripe PNGs whose dHash collapses to (doc_id % 7)
    // classes — history holds classes 0..3, so exactly the docs in
    // classes 4..6 are perceptually novel
    val mkPng = udf { id: Long =>
      MultimodalOps.encodeStripePng(9, 8, ((id % 7) * 36).toInt)
    }
    val all = Tables(spark, sf, "documents").limit(60)
      .select(col("doc_id"), mkPng(col("doc_id")).as("bytes"))
    val history = MultimodalOps.perceptualHash(
      all.filter(col("doc_id") % 7 < 4), "bytes").select("phash")
    val imgDir = Files.createTempDirectory("img_stream").toFile.getAbsolutePath
    all.coalesce(1).write.mode("overwrite").parquet(imgDir)
    val store = Files.createTempDirectory("vstore_img").toFile.getAbsolutePath + "/store"
    def run(ck: String): Unit = {
      val incoming = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, bytes BINARY"))
        .parquet(imgDir)
      graft.streaming.IncrementalDedup
        .screenImagesAndUpsertStream(incoming, history, store, ck)
    }
    run(ckpt())
    val stored = graft.sources.VectorStore.read(spark, store)
    val batchNovel = graft.streaming.IncrementalDedup
      .screenImagesBatch(all, history, "bytes")
    assert(stored.count() > 0, "classes 4..6 must be novel")
    // the stream stores ONE representative per perceptual hash; the
    // batch screen's distinct hash set must be exactly the stored keys
    val batchHashes = batchNovel.select("phash").distinct()
      .collect().map(r => f"${r.getLong(0)}%016x").toSet
    val storedKeys = stored.select("chunk_id").collect().map(_.getString(0)).toSet
    assert(storedKeys == batchHashes,
      s"stored $storedKeys != batch-novel $batchHashes")
    assert(stored.count() == storedKeys.size,
      "store key invariant: exactly ONE row per perceptual hash")
    assert(batchNovel.select("doc_id").collect().map(_.getLong(0))
      .forall(id => id % 7 >= 4), "only history-absent classes pass the screen")
    // a fresh checkpoint replays the whole source: the key-based upsert
    // must absorb the duplicates, not append them
    val n1 = stored.count()
    run(ckpt())
    assert(graft.sources.VectorStore.read(spark, store).count() == n1)
  }

  test("bloom-accelerated screen admits exactly the exact screen's novel set") {
    // the Bloom filter has no false negatives, so routing definite
    // misses around the exact anti-join cannot change the verdict —
    // only the work
    val all = Tables(spark, sf, "documents")
    val history = all.filter(col("doc_id") % 10 < 8)
    val incoming = all.filter(col("doc_id") % 10 >= 8)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(graft.streaming.IncrementalDedup.screenBatch(incoming, history))
    val bloom = ids(graft.streaming.IncrementalDedup.screenBatchBloom(incoming, history))
    assert(exact.nonEmpty)
    assert(bloom == exact, "sketch acceleration must be result-invariant")
  }

  test("streaming audio gate admits exactly the batch gate's set, replay-idempotent") {
    import graft.operators.MultimodalOps
    // the q_multimodal_audio_quality fixture family (SHARED generator —
    // see MultimodalOps.wavQualityFixture): docs with id % 10 ∈ {8, 9}
    // clip, leading-silence runs stay under the 50% default — so the
    // clipping rule is the active gate
    val mkWav = udf { id: Long => MultimodalOps.wavQualityFixture(id) }
    val all = Tables(spark, sf, "documents").limit(60)
      .select(col("doc_id"), mkWav(col("doc_id")).as("bytes"))
    val wavDir = Files.createTempDirectory("wav_stream").toFile.getAbsolutePath
    all.coalesce(1).write.mode("overwrite").parquet(wavDir)
    val store = Files.createTempDirectory("vstore_audio").toFile.getAbsolutePath + "/store"
    def run(ck: String): Unit = {
      val incoming = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, bytes BINARY"))
        .parquet(wavDir)
      graft.streaming.MediaStreams
        .gateAudioAndUpsertStream(incoming, store, ck, idCol = "doc_id")
    }
    run(ckpt())
    val stored = graft.sources.VectorStore.read(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchAdmitted = graft.streaming.MediaStreams.gateAudioBatch(all, "bytes")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stored.nonEmpty && stored == batchAdmitted,
      s"streamed gate must equal the batch gate: $stored vs $batchAdmitted")
    assert(batchAdmitted.forall(id => id % 10 < 8), "clipped docs must be rejected")
    assert(stored.size < 60, "some docs must actually be rejected")
    run(ckpt())
    assert(graft.sources.VectorStore.read(spark, store).count() == stored.size)
  }

  test("streaming tar export writes batch-scoped shards, replay-idempotent") {
    import graft.sources.TarShards
    val docsDir = {
      val dir = Files.createTempDirectory("docs_tar_stream")
      Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("part-0.parquet"))
      dir.toFile.getAbsolutePath
    }
    val outDir = Files.createTempDirectory("tar_export").toFile.getAbsolutePath + "/export"
    def run(ck: String): Unit = {
      val incoming = spark.readStream
        .schema(Tables(spark, sf, "documents").schema)
        .parquet(docsDir)
        .select(pmod(col("doc_id"), lit(4)).cast("int").as("shard"),
          concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
          col("text").cast("binary").as("bytes"))
      TarShards.writeStream(incoming, outDir, ck, "shard", "name", "bytes")
    }
    run(ckpt())
    val back = TarShards.read(spark, outDir, recursive = true)
    val nDocs = Tables(spark, sf, "documents").count()
    assert(back.count() == nDocs, "every document must land in some batch shard")
    assert(back.select("shard_file").distinct().collect()
      .forall(_.getString(0).startsWith("batch-")), "shards live under batch dirs")
    // text survives byte-exact through the export
    val got = back.filter(col("name") === "3.txt")
      .select(col("bytes").cast("string")).head.getString(0)
    val want = Tables(spark, sf, "documents")
      .filter(col("doc_id") === 3).select("text").head.getString(0)
    assert(got == want)
    // a fresh checkpoint replays the source; batch-id-scoped paths must
    // OVERWRITE, leaving the same entry count, not a doubled export
    run(ckpt())
    assert(TarShards.read(spark, outDir, recursive = true).count() == nDocs)
  }

  test("streaming avro export writes batch-scoped shards, replay-idempotent") {
    import graft.sources.AvroIo
    val docsDir = {
      val dir = Files.createTempDirectory("docs_avro_stream")
      Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("part-0.parquet"))
      dir.toFile.getAbsolutePath
    }
    val outDir = Files.createTempDirectory("avro_export").toFile.getAbsolutePath + "/export"
    val ddl = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    def run(ck: String): Unit = {
      val incoming = spark.readStream
        .schema(Tables(spark, sf, "documents").schema)
        .parquet(docsDir)
        .withColumn("shard", pmod(col("doc_id"), lit(4)))
      AvroIo.writeStream(incoming, outDir, ck, "shard", "doc_id")
    }
    run(ckpt())
    val back = AvroIo.read(spark, outDir, ddl, recursive = true)
    val nDocs = Tables(spark, sf, "documents").count()
    assert(back.count() == nDocs, "every document must land in some batch shard")
    // text survives exactly through the container encode/decode
    val got = back.filter(col("doc_id") === 3).select("text").head.getString(0)
    val want = Tables(spark, sf, "documents")
      .filter(col("doc_id") === 3).select("text").head.getString(0)
    assert(got == want)
    // replay from a fresh checkpoint overwrites batch-scoped paths —
    // same record count, not a doubled export
    run(ckpt())
    assert(AvroIo.read(spark, outDir, ddl, recursive = true).count() == nDocs)
  }

  test("streaming CMS total equals the batch sketch exactly, replay-idempotent") {
    import graft.operators.SketchOps
    import graft.streaming.SketchStreams
    val (w, d) = (64, 4)
    // two source files + maxFilesPerTrigger=1 → two genuine micro-batches
    val srcDir = {
      val dir = Files.createTempDirectory("cms_stream")
      Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("part-0.parquet"))
      Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("part-1.parquet"))
      dir.toFile.getAbsolutePath
    }
    val sketchDir = Files.createTempDirectory("cms_store").toFile.getAbsolutePath + "/sk"
    def run(ck: String): Unit = SketchStreams.aggregateStream(
      spark.readStream.schema(Tables(spark, sf, "documents").schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      sketchDir, ck, "doc_id", w, d)
    run(ckpt())
    assert(spark.read.parquet(sketchDir).count() >= 2, "expected multiple micro-batches")
    val streamed = SketchStreams.totalSketch(spark, sketchDir, w, d)
    // mergeability makes the streaming total EXACTLY the batch sketch
    val cms = udaf(new SketchOps.CmsAggregator(w, d))
    val batch = spark.read.parquet(srcDir)
      .select(md5(col("doc_id").cast("string")).as("mh"))
      .agg(cms(col("mh")).as("c")).head.getSeq[Long](0)
    assert(streamed == batch)
    // fresh checkpoint replays every batch: batch-id overwrite must keep
    // the total identical, not double it
    run(ckpt())
    assert(SketchStreams.totalSketch(spark, sketchDir, w, d) == batch)
  }

  test("streaming versioned-table sink commits exactly once per batch, replay-safe") {
    import graft.sources.TimeTravel
    import graft.streaming.TableStreams
    val srcDir = {
      val dir = Files.createTempDirectory("tt_stream")
      Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("part-0.parquet"))
      Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
        dir.resolve("part-1.parquet"))
      dir.toFile.getAbsolutePath
    }
    val tableDir = Files.createTempDirectory("tt_table").toFile.getAbsolutePath + "/t"
    def run(ck: String): Unit = TableStreams.appendStream(
      spark.readStream.schema(Tables(spark, sf, "documents").schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      tableDir, ck)
    run(ckpt())
    val nDocs = Tables(spark, sf, "documents").count()
    assert(TimeTravel.read(spark, tableDir).count() == 2 * nDocs)
    val vsAfterFirst = TimeTravel.versions(spark, tableDir)
    assert(vsAfterFirst.size >= 2, "each micro-batch must be its own commit")
    assert(TimeTravel.tags(spark, tableDir).forall(_.startsWith("stream:")))
    // a fresh checkpoint replays every batch id; tags must no-op them —
    // same rows, same versions, nothing double-appended
    run(ckpt())
    assert(TimeTravel.read(spark, tableDir).count() == 2 * nDocs)
    assert(TimeTravel.versions(spark, tableDir) == vsAfterFirst)
  }

  test("streamed commits carry skipping sidecars: streamed history prunes by range") {
    import graft.sources.TimeTravel
    import graft.streaming.TableStreams
    import spark.implicits._
    val srcDir = Files.createTempDirectory("tt_stream_stats")
    def drop(name: String, lo: Long, hi: Long): Unit = {
      val stage = Files.createTempDirectory("tt_stream_stage")
      (lo until hi).map(i => (i, i % 7)).toDF("k", "tag")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, srcDir.resolve(name))
    }
    drop("a.parquet", 0L, 1000L)
    drop("b.parquet", 1000L, 2000L)
    val tableDir = Files.createTempDirectory("tt_stream_stats_tbl").toString + "/t"
    TableStreams.appendStream(
      spark.readStream.schema("k BIGINT, tag BIGINT")
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString),
      tableDir, Files.createTempDirectory("ck_stats").toString,
      statsCols = Seq("k"))
    // each micro-batch commit wrote its sidecar; a range probe over the
    // streamed history reads only the overlapping batch's file(s)
    val (df, st) = TimeTravel.readPruned(spark, tableDir, "k", 1500, 1600)
    assert(st.filesTotal >= 2 && st.filesRead < st.filesTotal,
      s"streamed sidecars must prune: $st")
    assert(df.select("k").collect().map(_.getLong(0)).sorted.toSeq == (1500L to 1600L))
  }

  test("stream-stream interval join matches the batch attribution query") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.clickPurchaseJoin(stream), "t_attribution", "append", ckpt())
    val batch = queries.Events.qAttribution.run(spark, sf)
    assert(got.count() > 0)
    assert(got.count() == batch.count())
    assert(got.join(batch, Seq("click_id", "purchase_id", "user_id", "gap_us"), "inner")
      .count() == batch.count(), "streaming join must emit exactly the batch pairs")
  }

  test("stream-static broadcast enrichment matches the batch join") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val customers = Tables(spark, sf, "customer")
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.enrichWithCustomers(stream, customers), "t_enriched", "append", ckpt())
    val batch = Tables(spark, sf, "events")
      .join(customers, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("c_mktsegment"))
    assert(got.count() > 0)
    assert(got.count() == batch.count())
    assert(got.join(batch, Seq("event_id", "user_id", "event_type", "c_mktsegment"))
      .count() == batch.count())
  }

  test("watermarked dedup emits each event_id once") {
    val stream = EventStreams.readStream(spark, eventsDir)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.dedupEvents(stream), "t_dedup", "append", ckpt())
    assert(got.count() == got.select("event_id").distinct().count())
  }

  test("streaming drift report equals the batch report exactly, replay-idempotent") {
    import graft.streaming.DriftStreams
    // two source files + maxFilesPerTrigger=1 → two genuine micro-batches
    val srcDir = {
      val dir = Files.createTempDirectory("drift_stream")
      Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
        dir.resolve("part-0.parquet"))
      Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
        dir.resolve("part-1.parquet"))
      dir.toFile.getAbsolutePath
    }
    val countDir = Files.createTempDirectory("drift_store").toFile.getAbsolutePath + "/c"
    // reference: the event-type mix with one category deliberately absent
    // (full-outer coverage) and one synthetic extra
    val reference = Tables(spark, sf, "events")
      .filter(col("event_type") =!= "error")
      .groupBy(col("event_type").as("category")).agg(count(lit(1)).as("n"))
      .unionByName(spark.sql("SELECT 'retired_type' AS category, 50L AS n"))
    def run(ck: String): Unit = DriftStreams.countStream(
      spark.readStream.schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      countDir, ck, "event_type")
    run(ckpt())
    assert(spark.read.parquet(countDir)
      .select("batch_id").distinct().count() >= 2, "expected multiple micro-batches")
    val streamed = DriftStreams.driftReport(spark, countDir, reference).collect().toSeq
    // batch form over the same rows: counts are mergeable, so equality is exact
    val batchCur = spark.read.parquet(srcDir)
      .groupBy(col("event_type").as("category")).agg(count(lit(1)).as("n"))
    val direct = DriftStreams.driftReport(spark, countDir, reference)
      .select("category", "n_cur").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = batchCur.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(want.forall { case (c, n) => direct(c) == n },
      s"streamed counts diverge: $direct vs $want")
    // absent-from-stream category surfaces with n_cur=0 and negative delta
    val retired = streamed.find(_.getString(0) == "retired_type").get
    assert(retired.getLong(streamed.head.fieldIndex("n_cur")) == 0L)
    // fresh checkpoint replays every batch: batch-id overwrite keeps the
    // report identical, not doubled
    run(ckpt())
    assert(DriftStreams.driftReport(spark, countDir, reference).collect().toSeq == streamed)
  }

  test("streamed inverted index: batch probe scores identically, replay-idempotent") {
    import graft.sources.InvertedIndex
    import graft.streaming.IndexStreams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Tables(spark, sf, "documents")
    val rows = corpus.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val terms = Seq("vector", "hash", "join")

    val streamDir = java.nio.file.Files.createTempDirectory("invidx_stream").toString
    val input = MemoryStream[(Long, String)]
    input.addData(h1.toSeq: _*)
    input.addData(h2.toSeq: _*)
    IndexStreams.appendInvertedStream(
      input.toDF().toDF("doc_id", "text"), streamDir, ckpt())

    val batchDir = java.nio.file.Files.createTempDirectory("invidx_batch").toString
    InvertedIndex.build(corpus, batchDir)
    def probe(dir: String) = InvertedIndex.searchBm25(spark, dir, terms, 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = probe(batchDir)
    assert(probe(streamDir) == want,
      "the streamed layout must score identically to a from-scratch build")

    // at-least-once replay: same batches from a fresh checkpoint rewrite
    // their own batch dirs; the probe is unchanged
    val input2 = MemoryStream[(Long, String)]
    input2.addData(h1.toSeq: _*)
    input2.addData(h2.toSeq: _*)
    IndexStreams.appendInvertedStream(
      input2.toDF().toDF("doc_id", "text"), streamDir, ckpt())
    assert(probe(streamDir) == want, "replay must leave the index equivalent")
  }

  test("inverted index maintained FROM the table stream ≡ from-scratch build") {
    // the composed story the r9 verdict asked the streaming source for:
    // documents arrive as versioned-table COMMITS, and the index
    // maintains itself by consuming the table's append stream — no
    // hand-wired polling anywhere
    import graft.sources.{InvertedIndex, TimeTravel}
    import graft.streaming.{IndexStreams, TableStreams}
    import spark.implicits._
    val corpus = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val table = Files.createTempDirectory("tt_idx_src").toFile.getAbsolutePath + "/t"
    val idxDir = Files.createTempDirectory("tt_idx_out").toString
    val cp = ckpt()
    val terms = Seq("vector", "hash", "join")
    TimeTravel.commitOverwrite(corpus.filter(col("doc_id") < 250), table) // v1
    IndexStreams.appendInvertedStream(
      TableStreams.readTableStream(spark, table), idxDir, cp)
    TimeTravel.commitAppend(corpus.filter(col("doc_id") >= 250), table) // v2
    IndexStreams.appendInvertedStream(
      TableStreams.readTableStream(spark, table), idxDir, cp)
    val batchDir = Files.createTempDirectory("tt_idx_batch").toString
    InvertedIndex.build(Tables(spark, sf, "documents"), batchDir)
    def probe(dir: String) = InvertedIndex.searchBm25(spark, dir, terms, 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe(idxDir) == probe(batchDir),
      "index fed by the table's own append stream must score like a fresh build")
  }

  test("delta stream source: snapshot, appended-commit increments, removes fail loudly") {
    import graft.sources.{DeltaExport, TimeTravel}
    import spark.implicits._
    // a graft table zero-copy-published as Delta is the fixture writer
    val src = Files.createTempDirectory("dstream_src").toFile.getAbsolutePath + "/t"
    val dt = Files.createTempDirectory("dstream_dt").toFile.getAbsolutePath + "/d"
    val cp = ckpt()
    TimeTravel.commitOverwrite((1L to 40L).map(i => (i, i * 2)).toDF("k", "v"), src)
    DeltaExport.snapshot(spark, src, dt) // delta commit 0
    def runOnce(): Seq[org.apache.spark.sql.Row] = {
      val got = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val q = spark.readStream.format("graft-delta").load(dt)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    assert(runOnce().size == 40, "first batch = the exported snapshot")
    // commit 1: a fresh parquet file appended to the delta log by hand
    val extraDir = Files.createTempDirectory("dstream_extra").toFile.getAbsolutePath
    (41L to 50L).map(i => (i, i * 2)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(extraDir)
    val part = new java.io.File(extraDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    writeDeltaLog(dt, 1L, Seq(
      s"""{"add":{"path":"$part","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val run2 = runOnce()
    assert(run2.size == 10, "second run reads ONLY the appended commit's files")
    assert(run2.map(_.getLong(0)).toSet == (41L to 50L).toSet)
    assert(runOnce().isEmpty, "no new commits → no rows")
    // a remove in the window kills the stream loudly
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dt/_delta_log/" + f"${2L}%020d" + ".json"),
      s"""{"remove":{"path":"$part","deletionTimestamp":9,"dataChange":true}}\n""")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](runOnce())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("removed files")), messages(e).toString)
  }

  test("delta stream source: a row-level write-back commit kills the append-only stream loudly") {
    import graft.sources.{DeltaExport, TimeTravel}
    import spark.implicits._
    // the r12 write-back publishes deletes as protocol-upgrade +
    // remove/re-add actions — exactly the shapes the append-only
    // stream must refuse (a file diff would silently over-serve)
    val src = Files.createTempDirectory("dstream_rl_src").toFile.getAbsolutePath + "/t"
    val dt = Files.createTempDirectory("dstream_rl_dt").toFile.getAbsolutePath + "/d"
    val cp = ckpt()
    TimeTravel.commitOverwrite((1L to 20L).map(i => (i, i)).toDF("k", "v"), src)
    DeltaExport.snapshot(spark, src, dt)
    def runOnce(): Int = {
      var n = 0
      val q = spark.readStream.format("graft-delta").load(dt)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          n += b.count().toInt: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); n
    }
    assert(runOnce() == 20, "first batch = the exported snapshot")
    TimeTravel.deleteMoR(spark, src, col("k") <= 3L)
    DeltaExport.append(spark, src, dt) // publishes protocol + remove/re-add
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](runOnce())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("upgraded its protocol") || m.contains("removed files")),
      messages(e).toString)
  }

  test("iceberg stream source: snapshot, new-manifest increments, history rewrite fails loudly") {
    import graft.sources.IcebergRead
    import spark.implicits._
    val dir = Files.createTempDirectory("istream").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    val fields = Seq((1, "k", true, "long"), (2, "v", false, "long"))
    def part(name: String, rows: Seq[(Long, Long)]): String = {
      val tmp = Files.createTempDirectory("ipart2").toFile.getAbsolutePath
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    val f1 = part("f1.parquet", (1L to 30L).map(i => (i, i)))
    val m1 = IcebergRead.Fixture.manifest(dir, "m1.avro", Seq((1, f1, 0)))
    val ml1 = IcebergRead.Fixture.manifestList(dir, "snap-1.avro", Seq(m1))
    IcebergRead.Fixture.metadataMulti(dir, 1, 2, 100L, Seq((100L, ml1)), fields)
    def runOnce(): Seq[org.apache.spark.sql.Row] = {
      val got = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val q = spark.readStream.format("graft-iceberg").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    assert(runOnce().size == 30, "first batch = the current snapshot")
    // snapshot 2 keeps m1 and adds m2 (the append shape)
    val f2 = part("f2.parquet", (31L to 40L).map(i => (i, i)))
    val m2 = IcebergRead.Fixture.manifest(dir, "m2.avro", Seq((1, f2, 0)))
    val ml2 = IcebergRead.Fixture.manifestList(dir, "snap-2.avro", Seq(m1, m2))
    IcebergRead.Fixture.metadataMulti(dir, 2, 2, 200L,
      Seq((100L, ml1), (200L, ml2)), fields)
    val run2 = runOnce()
    assert(run2.size == 10 && run2.map(_.getLong(0)).toSet == (31L to 40L).toSet,
      "second run reads ONLY the new manifest's files")
    assert(runOnce().isEmpty, "no new snapshot → no rows")
    // snapshot 3 DROPS m1 (compaction rewrote history) → loud failure
    val ml3 = IcebergRead.Fixture.manifestList(dir, "snap-3.avro", Seq(m2))
    IcebergRead.Fixture.metadataMulti(dir, 3, 2, 300L,
      Seq((100L, ml1), (200L, ml2), (300L, ml3)), fields)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](runOnce())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dropped manifest")), messages(e).toString)
  }

  test("iceberg stream source: first batch serves a merge-on-read snapshot") {
    // liveFiles refused ANY delete-bearing snapshot, so no stream could
    // start from a real MoR table (r13): the first batch now applies
    // position deletes, equality deletes, and v3 puffin DVs through
    // the pinned IcebergRead.read — data scan streaming, delete sides
    // static — while deletes arriving AFTER the start offset keep
    // killing the stream loudly.
    import graft.sources.{IcebergRead, Puffin}
    import graft.sources.IcebergRead.EntryInfo
    import spark.implicits._
    val dir = Files.createTempDirectory("istream_mor").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    val fields = Seq((1, "k", true, "long"), (2, "v", false, "long"))
    def part(name: String, rows: Seq[(Long, Long)]): String = {
      val tmp = Files.createTempDirectory("ipart3").toFile.getAbsolutePath
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    val f1 = part("f1.parquet", (1L to 30L).map(i => (i, i)))
    // position deletes (pos 0, 5 → ids 1, 6); an equality delete on
    // k ∈ {20, 31} at seq 2 (applies to seq-1 f1 only → kills 20); a
    // DV superseding the position deletes plus positions 1, 2 (ids 2,3)
    val pdTmp = Files.createTempDirectory("ipd").toFile.getAbsolutePath
    Seq((f1, 0L), (f1, 5L)).toDF("file_path", "pos")
      .coalesce(1).write.mode("overwrite").parquet(pdTmp)
    val pd = { val f = new java.io.File(pdTmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/data/pd0.parquet")
      java.nio.file.Files.copy(f.toPath, dst.toPath); dst.getAbsolutePath }
    val eqTmp = Files.createTempDirectory("ieq").toFile.getAbsolutePath
    Seq(20L, 31L).toDF("k").coalesce(1).write.mode("overwrite").parquet(eqTmp)
    val eq = { val f = new java.io.File(eqTmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/data/eq0.parquet")
      java.nio.file.Files.copy(f.toPath, dst.toPath); dst.getAbsolutePath }
    val dvRefs = Puffin.writeDvFile(spark, s"$dir/data/dv.puffin",
      Seq((f1, Seq(0L, 1L, 2L, 5L))), snapshotId = 100L, sequenceNumber = 3L)
    // the data entry carries its manifest size, so the first batch
    // plans through the log-backed FileIndex (table-rooted) — the
    // shape real tables stream in; the root-restricted streaming mark
    // must cover it, not just the listing fallback
    val m1 = IcebergRead.Fixture.manifestV2(dir, "m1.avro",
      Seq(EntryInfo(1, f1, 0, 1L, Nil,
        sizeInBytes = Some(new java.io.File(f1).length()))))
    val mDel = IcebergRead.Fixture.manifestV2(dir, "mdel.avro", Seq(
      EntryInfo(1, pd, 1, 2L, Nil),
      EntryInfo(1, eq, 2, 2L, Seq(1)),
      EntryInfo(1, s"$dir/data/dv.puffin", 1, 3L, Nil,
        Some((f1, dvRefs.head.offset, dvRefs.head.length)))))
    val ml1 = IcebergRead.Fixture.manifestList(dir, "snap-1.avro", Seq(m1, mDel))
    IcebergRead.Fixture.metadataMulti(dir, 1, 3, 100L, Seq((100L, ml1)), fields)
    def runOnce(): Seq[org.apache.spark.sql.Row] = {
      val got = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val q = spark.readStream.format("graft-iceberg").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    val batch0 = runOnce()
    assert(batch0.map(_.getLong(0)).toSet ==
      ((1L to 30L).toSet -- Set(1L, 2L, 3L, 6L, 20L)),
      s"first batch must be the MoR row set, got ${batch0.size} rows")
    // append increment still streams (old delete manifests stay listed)
    val f2 = part("f2.parquet", (31L to 40L).map(i => (i, i)))
    val m2 = IcebergRead.Fixture.manifest(dir, "m2.avro", Seq((1, f2, 0)))
    val ml2 = IcebergRead.Fixture.manifestList(dir, "snap-2.avro", Seq(m1, mDel, m2))
    IcebergRead.Fixture.metadataMulti(dir, 2, 3, 200L,
      Seq((100L, ml1), (200L, ml2)), fields)
    val run2 = runOnce()
    assert(run2.map(_.getLong(0)).toSet == (31L to 40L).toSet,
      "increment reads only the new data manifest (31 survives: the seq-2 " +
        s"equality delete predates it), got ${run2.map(_.getLong(0)).toSet}")
    // a NEW delete manifest in the window still kills the stream
    val mDel2 = IcebergRead.Fixture.manifestV2(dir, "mdel2.avro", Seq(
      EntryInfo(1, pd, 1, 5L, Nil)))
    val ml3 = IcebergRead.Fixture.manifestList(dir, "snap-3.avro",
      Seq(m1, mDel, m2, mDel2))
    IcebergRead.Fixture.metadataMulti(dir, 3, 3, 300L,
      Seq((100L, ml1), (200L, ml2), (300L, ml3)), fields)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](runOnce())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("DELETE files")), messages(e).toString)
  }

  test("iceberg stream source: manifest-carrying id offsets survive snapshot expiry") {
    import graft.sources.IcebergRead
    import spark.implicits._
    val dir = Files.createTempDirectory("istream_exp").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    val fields = Seq((1, "k", true, "long"), (2, "v", false, "long"))
    def part(name: String, rows: Seq[(Long, Long)]): String = {
      val tmp = Files.createTempDirectory("ipart3").toFile.getAbsolutePath
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    def runOnce(): Seq[org.apache.spark.sql.Row] = {
      val got = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val q = spark.readStream.format("graft-iceberg").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    // three snapshots: 100 (f1), 200 (f1+f2), 300 (f1+f2+f3)
    val f1 = part("f1.parquet", (1L to 10L).map(i => (i, i)))
    val m1 = IcebergRead.Fixture.manifest(dir, "m1.avro", Seq((1, f1, 0)))
    val ml1 = IcebergRead.Fixture.manifestList(dir, "snap-1.avro", Seq(m1))
    IcebergRead.Fixture.metadataMulti(dir, 1, 2, 100L, Seq((100L, ml1)), fields)
    assert(runOnce().size == 10)
    val f2 = part("f2.parquet", (11L to 15L).map(i => (i, i)))
    val m2 = IcebergRead.Fixture.manifest(dir, "m2.avro", Seq((1, f2, 0)))
    val ml2 = IcebergRead.Fixture.manifestList(dir, "snap-2.avro", Seq(m1, m2))
    IcebergRead.Fixture.metadataMulti(dir, 2, 2, 200L,
      Seq((100L, ml1), (200L, ml2)), fields)
    assert(runOnce().size == 5, "checkpoint now stands on snapshot 200")
    // the external writer EXPIRES snapshot 100: list indices shift by
    // one, but snapshot 200 (the checkpointed id) is intact — the
    // r10-advice failure mode where positional offsets silently re-map.
    // Snapshot 300 appends f3; the stream must serve EXACTLY f3's rows.
    val f3 = part("f3.parquet", (16L to 18L).map(i => (i, i)))
    val m3 = IcebergRead.Fixture.manifest(dir, "m3.avro", Seq((1, f3, 0)))
    val ml3 = IcebergRead.Fixture.manifestList(dir, "snap-3.avro", Seq(m1, m2, m3))
    IcebergRead.Fixture.metadataMulti(dir, 3, 2, 300L,
      Seq((200L, ml2), (300L, ml3)), fields) // snapshot 100 expired
    val run3 = runOnce()
    assert(run3.map(_.getLong(0)).toSet == (16L to 18L).toSet,
      s"expiry of OLDER snapshots must not skip or replay; got ${run3.map(_.getLong(0))}")
    // even the CHECKPOINTED snapshot (300) may expire: the offset
    // carries its manifest names, so the diff needs no lookup — the
    // stream keeps serving exactly the new manifest's rows (history
    // REWRITES — dropped manifests — still die loudly; see the
    // companion test)
    val f4 = part("f4.parquet", Seq((19L, 19L)))
    val m4 = IcebergRead.Fixture.manifest(dir, "m4.avro", Seq((1, f4, 0)))
    val ml4 = IcebergRead.Fixture.manifestList(dir, "snap-4.avro",
      Seq(m1, m2, m3, m4))
    IcebergRead.Fixture.metadataMulti(dir, 4, 2, 400L, Seq((400L, ml4)), fields)
    val run4 = runOnce()
    assert(run4.map(_.getLong(0)).toSet == Set(19L),
      s"manifest-carrying offsets must survive full expiry; got ${run4.map(_.getLong(0))}")
  }

  test("delta stream source: readChangeFeed serves cdc files and add-only inserts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dstream_cdf").toFile.getAbsolutePath + "/t"
    new java.io.File(dir).mkdirs()
    val cp = ckpt()
    def stagePart(rel: String, df: org.apache.spark.sql.DataFrame): String = {
      val tmp = Files.createTempDirectory("dcdf_part").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/$rel")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    val schemaEsc = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
      .json.replace("\\", "\\\\").replace("\"", "\\\"")
    stagePart("f1.parquet", (1L to 10L).map(i => (i, i * 2)).toDF("k", "v"))
    writeDeltaLog(dir, 0L,
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaEsc","partitionColumns":[],"configuration":{}}}""",
        """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    def runOnce(): Seq[org.apache.spark.sql.Row] = {
      val got = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    val run1 = runOnce()
    assert(run1.size == 10 &&
      run1.forall(r => r.getString(2) == "insert" && r.getLong(3) == 0L),
      "first batch = snapshot stamped as inserts of the pinned version")
    // v1: pure append → inserts
    stagePart("f2.parquet", Seq((11L, 22L)).toDF("k", "v"))
    writeDeltaLog(dir, 1L, Seq(
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""))
    val run2 = runOnce()
    assert(run2.map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet ==
      Set((11L, "insert", 1L)), s"got $run2")
    // v2: a delete with change data → the cdc rows stream as deletes
    stagePart("_change_data/cdc-0.parquet",
      Seq((1L, 2L, "delete"), (2L, 4L, "delete")).toDF("k", "v", "_change_type"))
    stagePart("f3.parquet", (3L to 10L).map(i => (i, i * 2)).toDF("k", "v"))
    writeDeltaLog(dir, 2L,
      Seq("""{"remove":{"path":"f1.parquet","deletionTimestamp":3,"dataChange":true}}""",
        """{"add":{"path":"f3.parquet","partitionValues":{},"size":1,"modificationTime":3,"dataChange":true}}""",
        """{"cdc":{"path":"_change_data/cdc-0.parquet","partitionValues":{},"size":1,"dataChange":false}}"""))
    val run3 = runOnce()
    assert(run3.map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet ==
      Set((1L, "delete", 2L), (2L, "delete", 2L)), s"got $run3")
    // v3: a remove WITHOUT change data kills the CDF stream loudly
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_delta_log/" + f"${3L}%020d" + ".json"),
      """{"remove":{"path":"f3.parquet","deletionTimestamp":4,"dataChange":true}}""" + "\n")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](runOnce())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("without change")), messages(e).toString)
  }

  test("iceberg stream source: startingSnapshotId skips the initial snapshot") {
    import graft.sources.IcebergRead
    import spark.implicits._
    val dir = Files.createTempDirectory("istream_start").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    val fields = Seq((1, "k", true, "long"), (2, "v", false, "long"))
    def part(name: String, rows: Seq[(Long, Long)]): String = {
      val tmp = Files.createTempDirectory("istart_part").toFile.getAbsolutePath
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    val f1 = part("f1.parquet", (1L to 30L).map(i => (i, i)))
    val m1 = IcebergRead.Fixture.manifest(dir, "m1.avro", Seq((1, f1, 0)))
    val ml1 = IcebergRead.Fixture.manifestList(dir, "snap-1.avro", Seq(m1))
    val f2 = part("f2.parquet", (31L to 35L).map(i => (i, i)))
    val m2 = IcebergRead.Fixture.manifest(dir, "m2.avro", Seq((1, f2, 0)))
    val ml2 = IcebergRead.Fixture.manifestList(dir, "snap-2.avro", Seq(m1, m2))
    IcebergRead.Fixture.metadataMulti(dir, 2, 2, 200L,
      Seq((100L, ml1), (200L, ml2)), fields)
    val got = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("graft-iceberg")
      .option("startingSnapshotId", "100").load(dir)
      .writeStream.outputMode("append").option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect() }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(got.map(_.getLong(0)).toSet == (31L to 35L).toSet,
      s"only the post-100 increment must stream; got ${got.map(_.getLong(0))}")
    // an expired/unknown starting id declines loudly at source creation
    val e = intercept[Exception] {
      val q2 = spark.readStream.format("graft-iceberg")
        .option("startingSnapshotId", "999").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", ckpt())
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("startingSnapshotId")), messages(e).toString)
  }

  test("stream sources: startingTimestamp resolves the resume point on both formats") {
    import graft.sources.{DeltaExport, IcebergRead, TimeTravel}
    import spark.implicits._
    // ---- delta: commit mtimes drive the resolution
    val src = Files.createTempDirectory("dts_src").toFile.getAbsolutePath + "/t"
    val dir = Files.createTempDirectory("dts_tgt").toFile.getAbsolutePath + "/d"
    TimeTravel.commitOverwrite((1L to 30L).map(i => (i, i)).toDF("k", "v"), src)
    DeltaExport.snapshot(spark, src, dir)
    TimeTravel.commitAppend((31L to 35L).map(i => (i, i)).toDF("k", "v"), src)
    DeltaExport.append(spark, src, dir)
    def cj(v: Long) = new java.io.File(s"$dir/_delta_log/" + f"$v%020d" + ".json")
    assert(cj(0).setLastModified(1000) && cj(1).setLastModified(2000))
    def runDelta(opts: Map[String, String]): Seq[Long] = {
      val got = new scala.collection.mutable.ArrayBuffer[Long]()
      val q = opts.foldLeft(spark.readStream.format("graft-delta")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", ckpt())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized {
            got ++= b.select("k").collect().map(_.getLong(0))
          }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    // mid-history: everything stamped ≥ 1500 = the v1 increment only
    assert(runDelta(Map("startingTimestamp" -> "1500")).toSet ==
      (31L to 35L).toSet, "mid-history timestamp must serve the later commit only")
    // predating the log: the full snapshot first batch (= everything)
    assert(runDelta(Map("startingTimestamp" -> "5")).size == 35)
    // both options together decline loudly
    val e = intercept[Exception](
      runDelta(Map("startingTimestamp" -> "5", "startingVersion" -> "0")))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("not both")), messages(e).toString)
    // ---- iceberg: the snapshot-log drives the resolution
    val idir = Files.createTempDirectory("its").toFile.getAbsolutePath + "/t"
    val fields = Seq((1, "k", true, "long"), (2, "v", false, "long"))
    def part(name: String, rows: Seq[(Long, Long)]): String = {
      val tmp = Files.createTempDirectory("its_part").toFile.getAbsolutePath
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$idir/data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    val f1 = part("f1.parquet", (1L to 30L).map(i => (i, i)))
    val m1 = IcebergRead.Fixture.manifest(idir, "m1.avro", Seq((1, f1, 0)))
    val ml1 = IcebergRead.Fixture.manifestList(idir, "snap-1.avro", Seq(m1))
    val f2 = part("f2.parquet", (31L to 35L).map(i => (i, i)))
    val m2 = IcebergRead.Fixture.manifest(idir, "m2.avro", Seq((1, f2, 0)))
    val ml2 = IcebergRead.Fixture.manifestList(idir, "snap-2.avro", Seq(m1, m2))
    IcebergRead.Fixture.metadataMulti(idir, 2, 2, 200L,
      Seq((100L, ml1), (200L, ml2)), fields,
      timestamps = Map(100L -> 1000L, 200L -> 2000L))
    def runIce(ts: String): Seq[Long] = {
      val got = new scala.collection.mutable.ArrayBuffer[Long]()
      val q = spark.readStream.format("graft-iceberg")
        .option("startingTimestamp", ts).load(idir)
        .writeStream.outputMode("append").option("checkpointLocation", ckpt())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized {
            got ++= b.select("k").collect().map(_.getLong(0))
          }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    assert(runIce("1500").toSet == (31L to 35L).toSet,
      "mid-history timestamp must serve the post-snap-100 increment only")
    assert(runIce("5").size == 35, "pre-history timestamp serves everything")
  }

  test("iceberg stream source: maxManifestsPerTrigger bounds each batch to whole snapshots") {
    import graft.sources.IcebergRead
    import spark.implicits._
    val dir = Files.createTempDirectory("istream_rate").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    val fields = Seq((1, "k", true, "long"), (2, "v", false, "long"))
    def part(name: String, rows: Seq[(Long, Long)]): String = {
      val tmp = Files.createTempDirectory("irate_part").toFile.getAbsolutePath
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    val batchSizes = new scala.collection.mutable.ArrayBuffer[Int]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-iceberg")
        .option("maxManifestsPerTrigger", "1").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count().toInt
          if (n > 0) batchSizes.synchronized { batchSizes += n }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val f1 = part("f1.parquet", (1L to 4L).map(i => (i, i)))
    val m1 = IcebergRead.Fixture.manifest(dir, "m1.avro", Seq((1, f1, 0)))
    val ml1 = IcebergRead.Fixture.manifestList(dir, "snap-1.avro", Seq(m1))
    IcebergRead.Fixture.metadataMulti(dir, 1, 2, 100L, Seq((100L, ml1)), fields)
    runOnce()
    assert(batchSizes.toSeq == Seq(4), s"got $batchSizes")
    // three appended snapshots, one new manifest each (10 / 5 / 3 rows)
    val sizes = Seq(10L, 5L, 3L)
    var next = 100L
    var manifests = Seq(m1)
    var snapshots = Seq((100L, ml1))
    sizes.zipWithIndex.foreach { case (n, i) =>
      val f = part(s"f${i + 2}.parquet", (next until next + n).map(j => (j, j)))
      next += n
      val m = IcebergRead.Fixture.manifest(dir, s"m${i + 2}.avro", Seq((1, f, 0)))
      manifests :+= m
      val ml = IcebergRead.Fixture.manifestList(dir, s"snap-${i + 2}.avro", manifests)
      snapshots :+= ((200L + i, ml))
      IcebergRead.Fixture.metadataMulti(dir, i + 2, 2, 200L + i, snapshots, fields)
    }
    (1 to 5).foreach(_ => runOnce())
    val got = batchSizes.toSeq
    assert(got.sum == 4 + 18, s"all rows exactly once, got $got")
    assert(got.tail == sizes.map(_.toInt),
      s"each later batch = one snapshot under the 1-manifest limit, in order; got $got")
  }

  test("stream sources: rate caps persist across restarts via metadataPath (r13)") {
    // source-level pin, independent of the engine's recovery-replay
    // quirk: a FRESH source seeded only by the metadataPath progress
    // record must cap its first getOffset
    import graft.sources.{DeltaStreamSource, IcebergRead, IcebergStreamSource}
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    import spark.implicits._
    val dir = Files.createTempDirectory("dsrc_persist").toFile.getAbsolutePath + "/t"
    val mp = Files.createTempDirectory("dsrc_mp").toFile.getAbsolutePath
    new java.io.File(dir).mkdirs()
    val schemaEsc = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
      .json.replace("\\", "\\\\").replace("\"", "\\\"")
    def stagePart(rel: String, rows: Seq[Long]): Unit = {
      val tmp = Files.createTempDirectory("dsp_part").toFile.getAbsolutePath
      rows.toDF("k").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(s"$dir/$rel")): Unit
    }
    stagePart("f0.parquet", Seq(1L))
    writeDeltaLog(dir, 0L,
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaEsc","partitionColumns":[],"configuration":{}}}""",
        """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    (1 to 3).foreach { i =>
      stagePart(s"f$i.parquet", Seq(i * 10L))
      writeDeltaLog(dir, i.toLong, Seq(
        s"""{"add":{"path":"f$i.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""))
    }
    // run 1: snapshot batch at v0 committed, then the process "dies"
    val s1 = new DeltaStreamSource(spark, dir, None, cdf = false,
      maxFilesPerTrigger = Some(1), metadataPath = Some(mp))
    s1.getBatch(None, LongOffset(0L)) // plan (streaming frame — not executed here)
    s1.commit(LongOffset(0L))
    // run 2: a FRESH source (no engine replay) must cap its first plan
    val s2 = new DeltaStreamSource(spark, dir, None, cdf = false,
      maxFilesPerTrigger = Some(1), metadataPath = Some(mp))
    assert(s2.getOffset.contains(LongOffset(1L)),
      s"first post-restart offset must advance ONE capped commit, got ${s2.getOffset}")
    s2.commit(LongOffset(1L))
    val s3 = new DeltaStreamSource(spark, dir, None, cdf = false,
      maxFilesPerTrigger = Some(1), metadataPath = Some(mp))
    assert(s3.getOffset.contains(LongOffset(2L)),
      s"cap must keep walking one commit per restart, got ${s3.getOffset}")
    // iceberg: same shape — snapshot consumed, restart, capped advance
    val idir = Files.createTempDirectory("isrc_persist").toFile.getAbsolutePath + "/t"
    val imp = Files.createTempDirectory("isrc_mp").toFile.getAbsolutePath
    val fields = Seq((1, "k", true, "long"))
    def ipart(name: String, rows: Seq[Long]): String = {
      val tmp = Files.createTempDirectory("isp_part").toFile.getAbsolutePath
      rows.toDF("k").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$idir/data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    var manifests = Seq.empty[String]
    var snapshots = Seq.empty[(Long, String)]
    (0 to 2).foreach { i =>
      val f = ipart(s"f$i.parquet", Seq(i.toLong))
      manifests :+= IcebergRead.Fixture.manifest(idir, s"m$i.avro", Seq((1, f, 0)))
      val ml = IcebergRead.Fixture.manifestList(idir, s"snap-$i.avro", manifests)
      snapshots :+= ((100L + i, ml))
      IcebergRead.Fixture.metadataMulti(idir, i + 1, 2, 100L + i, snapshots, fields)
    }
    val i1 = new IcebergStreamSource(spark, idir,
      maxManifestsPerTrigger = Some(1), startingSnapshotId = Some(100L),
      metadataPath = Some(imp))
    val firstOff = i1.getOffset.get // capped: one snapshot past 100
    i1.commit(firstOff)
    val i2 = new IcebergStreamSource(spark, idir,
      maxManifestsPerTrigger = Some(1), startingSnapshotId = Some(100L),
      metadataPath = Some(imp))
    val secondOff = i2.getOffset.get
    assert(firstOff.json.contains("\"sid\":101") &&
      secondOff.json.contains("\"sid\":102"),
      s"iceberg cap must persist across restarts: $firstOff then $secondOff")
  }

  test("delta stream source: maxFilesPerTrigger bounds each batch to whole commits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dstream_rate").toFile.getAbsolutePath + "/t"
    new java.io.File(dir).mkdirs()
    val cp = ckpt()
    def stagePart(rel: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = Files.createTempDirectory("drate_part").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/$rel")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(f.toPath, dst.toPath)
    }
    val schemaEsc = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
      .json.replace("\\", "\\\\").replace("\"", "\\\"")
    stagePart("f0.parquet", (1L to 4L).map(i => (i, i)).toDF("k", "v"))
    writeDeltaLog(dir, 0L,
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaEsc","partitionColumns":[],"configuration":{}}}""",
        """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val batchSizes = new scala.collection.mutable.ArrayBuffer[Int]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "1").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count().toInt
          if (n > 0) batchSizes.synchronized { batchSizes += n }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce() // first batch = the pinned v0 snapshot (never split)
    assert(batchSizes.toSeq == Seq(4), s"got $batchSizes")
    // three more single-file commits of 10 / 5 / 3 rows land AFTER the
    // snapshot; under a 1-file limit each drains as its own batch
    val sizes = Seq(10L, 5L, 3L)
    var next = 100L
    sizes.zipWithIndex.foreach { case (n, i) =>
      stagePart(s"f${i + 1}.parquet",
        (next until next + n).map(j => (j, j)).toDF("k", "v"))
      next += n
      writeDeltaLog(dir, (i + 1).toLong, Seq(
        s"""{"add":{"path":"f${i + 1}.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""))
    }
    (1 to 5).foreach(_ => runOnce())
    val got = batchSizes.toSeq
    assert(got.sum == 4 + 18, s"all rows exactly once, got $got")
    assert(got.tail == sizes.map(_.toInt),
      s"each later batch = one commit under the 1-file limit, in order; got $got")
  }

  test("transformWithState running totals equal the batch aggregate across batches") {
    import graft.streaming.StateApi
    import graft.streaming.StateApi.UserEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // the new arbitrary-state API requires the RocksDB store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rows = Tables(spark, sf, "events")
        .select(col("user_id"),
          expr("CAST(ROUND(value * 100.0) AS BIGINT)").as("cents"))
        .as[(Long, Long)].collect().map { case (u, c) => UserEvent(u, c) }
      val (h1, h2) = rows.splitAt(rows.length / 2)

      val input = MemoryStream[UserEvent]
      val out = StateApi.runningTotals(input.toDS())
      val q = out.toDF().writeStream.format("memory").queryName("t_tws")
        .outputMode("update").option("checkpointLocation", ckpt()).start()
      try {
        input.addData(h1.toSeq: _*)
        q.processAllAvailable()
        input.addData(h2.toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()

      // latest emission per key (n_events is monotone) == batch aggregate
      val got = spark.table("t_tws")
        .groupBy("user_id")
        .agg(max(col("n_events")).as("n"), max(col("sum_cents")).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_.user_id).map { case (u, es) =>
        (u, es.length.toLong, es.map(_.cents).sum)
      }.toSet
      assert(got == want, "cross-batch state must reproduce the batch aggregate")
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  // ---- versioned-table streaming SOURCE (readStream FROM the table)

  /** One AvailableNow pass over the table stream; returns the rows THIS
    * run emitted (foreachBatch — the memory sink can't recover from a
    * checkpoint, and per-run deltas are exactly what the tests pin). */
  private def runTableStream(dir: String, cp: String,
      options: Map[String, String] = Map.empty): Seq[org.apache.spark.sql.Row] = {
    val got = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    var r = spark.readStream.format("graft-table")
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(dir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= batch.collect() }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    got.toSeq
  }

  test("table stream source: snapshot first batch, append-only increments, replay idempotent") {
    import graft.sources.TimeTravel
    import spark.implicits._
    val dir = Files.createTempDirectory("tt_ssrc").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    TimeTravel.commitOverwrite((1L to 50L).map(i => (i, i * 2)).toDF("k", "v"), dir)
    // pending DVs at stream start: the first batch must be the
    // DV-applied snapshot (stream-static anti-join)
    TimeTravel.deleteMoR(spark, dir, col("k") > 45)
    assert(runTableStream(dir, cp).size == 45,
      "first batch = the snapshot with tombstones applied")
    TimeTravel.commitAppend((51L to 60L).map(i => (i, i * 2)).toDF("k", "v"), dir)
    TimeTravel.commitAppend((61L to 70L).map(i => (i, i * 2)).toDF("k", "v"), dir)
    val run2 = runTableStream(dir, cp)
    assert(run2.size == 20, "second run reads ONLY the appended directories")
    // streamed union ≡ batch readAppendsSince per the covered range
    val streamed = run2.map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = TimeTravel.readAppendsSince(spark, dir, 2L)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch, "streamed rows ≡ batch readAppendsSince")
    assert(runTableStream(dir, cp).isEmpty,
      "no new commits → no rows (offsets are durable versions)")
  }

  test("table stream source: filters push into the parquet scan UNDER the stream") {
    // the design claim of the V1 getBatch approach: flipping isStreaming
    // on the resolved file relation keeps the whole batch scan stack —
    // a filter in the streaming query must reach the scan as a pushed
    // predicate, not evaluate post-scan over full rows
    import graft.sources.TimeTravel
    import spark.implicits._
    val dir = Files.createTempDirectory("tt_ssrc_push").toFile.getAbsolutePath + "/t"
    TimeTravel.commitOverwrite((1L to 100L).map(i => (i, i)).toDF("k", "v"), dir)
    val q = spark.readStream.format("graft-table").load(dir)
      .filter(col("k") > 90)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => (): Unit }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution
    assert(exec != null, "the AvailableNow run must have executed a batch")
    val plan = exec.executedPlan.toString
    assert("""PushedFilters: \[[^\]]*GreaterThan\(k,90\)""".r.findFirstIn(plan).isDefined,
      s"the stream's filter must reach the parquet scan as a pushed predicate:\n$plan")
  }

  test("table stream source: startingVersion skips the initial snapshot") {
    import graft.sources.TimeTravel
    import spark.implicits._
    val dir = Files.createTempDirectory("tt_ssrc_sv").toFile.getAbsolutePath + "/t"
    TimeTravel.commitOverwrite((1L to 30L).map(i => (i, i)).toDF("k", "v"), dir)
    TimeTravel.commitAppend((31L to 40L).map(i => (i, i)).toDF("k", "v"), dir)
    assert(runTableStream(dir, ckpt(), Map("startingVersion" -> "1")).size == 10,
      "startingVersion=1 consumes only the appends after v1")
  }

  test("table stream source: non-append divergence fails loudly") {
    import graft.sources.TimeTravel
    import spark.implicits._
    val dir = Files.createTempDirectory("tt_ssrc_div").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    TimeTravel.commitOverwrite((1L to 20L).map(i => (i, i)).toDF("k", "v"), dir)
    assert(runTableStream(dir, cp).size == 20)
    TimeTravel.commitOverwrite((1L to 5L).map(i => (i, -i)).toDF("k", "v"), dir)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runTableStream(dir, cp)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("diverged")),
      s"expected append-only divergence error, got: ${messages(e)}")
    // a MoR delete mid-stream is divergence too (row set shrank)
    val dir2 = Files.createTempDirectory("tt_ssrc_div2").toFile.getAbsolutePath + "/t"
    val cp2 = ckpt()
    TimeTravel.commitOverwrite((1L to 20L).map(i => (i, i)).toDF("k", "v"), dir2)
    assert(runTableStream(dir2, cp2).size == 20)
    TimeTravel.deleteMoR(spark, dir2, col("k") <= 3)
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runTableStream(dir2, cp2)
    }
    assert(messages(e2).exists(_.contains("deletion vectors changed")),
      s"expected DV divergence error, got: ${messages(e2)}")
  }

  test("table stream source: cdf mode streams the change feed, ≡ batch changeFeed") {
    import graft.sources.TimeTravel
    import spark.implicits._
    val dir = Files.createTempDirectory("tt_ssrc_cdf").toFile.getAbsolutePath + "/t"
    TimeTravel.commitOverwrite((1L to 20L).map(i => (i, i * 2)).toDF("k", "v"), dir)
    TimeTravel.deleteMoR(spark, dir, col("k") <= 3) // v2: row-level churn
    TimeTravel.commitAppend((21L to 25L).map(i => (i, i * 2)).toDF("k", "v"), dir) // v3
    val rows = runTableStream(dir, ckpt(),
      Map("streamMode" -> "cdf", "key" -> "k"))
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = TimeTravel.changeFeed(spark, dir, "k", 1L, 3L)
      .as[(Long, Long, String)].collect().toSet
    assert(rows.size == want.size && got == want,
      "cdf stream batch ≡ TimeTravel.changeFeed over the same offsets")
  }

  test("iceberg stream source: expiry of a CONSUMED snapshot is harmless (offset carries manifests)") {
    // the r13 expireSnapshots interplay: the checkpointed offset records
    // its snapshot's manifest names, so routine history expiry of
    // already-consumed snapshots never strands the stream — the next
    // batch diffs against the recorded names, not the (gone) list entry
    import graft.sources.{IcebergExport, IcebergMaintenance, TimeTravel}
    import java.nio.file.Files
    import spark.implicits._
    val base = Files.createTempDirectory("istream_exp_src").toFile.getAbsolutePath
    val dir = Files.createTempDirectory("istream_exp").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    TimeTravel.commitOverwrite(
      (1L to 20L).map(i => (i, i)).toDF("k", "v").coalesce(1), base)
    IcebergExport.snapshot(spark, base, dir) // S1
    def runOnce(): Seq[org.apache.spark.sql.Row] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val q = spark.readStream.format("graft-iceberg").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    assert(runOnce().size == 20, "first batch = the full S1 snapshot")
    // S2 appends, then S1 — the snapshot the checkpoint stands on —
    // expires; the resumed stream must still serve exactly S2's files
    TimeTravel.commitAppend(
      (21L to 30L).map(i => (i, i)).toDF("k", "v").coalesce(1), base)
    IcebergExport.append(spark, base, dir) // S2
    val r = IcebergMaintenance.expireSnapshots(spark, dir, retainLast = 1)
    assert(r.expiredSnapshotIds.size == 1, "S1 must expire")
    val run2 = runOnce()
    assert(run2.size == 10 && run2.map(_.getLong(0)).toSet == (21L to 30L).toSet,
      "the batch after expiry serves ONLY the post-consumed files")
    assert(runOnce().isEmpty, "no new snapshot → no rows")
  }

  test("iceberg stream source: expired-snapshot replay reconstructs MoR; eq-deletes stay loud") {
    // the recovery-replay fallback EXECUTED end to end: a crash between
    // batch 0's run and its commit (simulated by deleting commits/0)
    // makes the engine re-execute the initial MoR snapshot batch on
    // restart — after expireSnapshots dropped that snapshot, the
    // offset's recorded manifests must reconstruct it, position deletes
    // applied, values intact
    import graft.sources.{IcebergExport, IcebergMaintenance, IcebergRead,
      IcebergStreamSource, TimeTravel}
    import graft.sources.IcebergRead.EntryInfo
    import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
    import java.nio.file.Files
    import spark.implicits._
    val base = Files.createTempDirectory("istream_fb_src").toFile.getAbsolutePath
    val dir = Files.createTempDirectory("istream_fb").toFile.getAbsolutePath + "/t"
    val cp = ckpt()
    TimeTravel.commitOverwrite(
      (1L to 10L).map(i => (i, i * 2)).toDF("k", "v").coalesce(1), base)
    TimeTravel.deleteMoR(spark, base, col("k") === 2 || col("k") === 5)
    IcebergExport.snapshot(spark, base, dir) // S1: data + position deletes
    def runOnce(at: String): Seq[org.apache.spark.sql.Row] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val q = spark.readStream.format("graft-iceberg").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", at)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    val expect1 = (1L to 10L).filterNot(k => k == 2 || k == 5).toSet
    assert(runOnce(cp).map(_.getLong(0)).toSet == expect1,
      "first batch = the MoR snapshot")
    // simulate the crash: batch 0 ran but never committed — on a COPY
    // of the checkpoint (the engine caches metadata logs per path, so
    // deleting behind the live path trips its concurrent-use guard)
    val cp2 = ckpt()
    def copyRec(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles()).getOrElse(Array.empty)
          .foreach(f => copyRec(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
    new java.io.File(cp2).delete()
    copyRec(new java.io.File(cp), new java.io.File(cp2))
    assert(new java.io.File(s"$cp2/commits/0").delete(), "commits/0 must exist")
    new java.io.File(s"$cp2/commits/.0.crc").delete() // stale checksum sidecar
    // ... and S1 expires before the restart
    TimeTravel.commitAppend(
      (11L to 15L).map(i => (i, i * 2)).toDF("k", "v").coalesce(1), base)
    IcebergExport.append(spark, base, dir) // S2
    assert(IcebergMaintenance.expireSnapshots(spark, dir, retainLast = 1)
      .expiredSnapshotIds.size == 1)
    // restart: batch 0 RE-EXECUTES through the fallback (recorded
    // manifests, position deletes applied), then S2 arrives (same run
    // or the next AvailableNow trigger — recovery-replay runs may
    // terminate at the restored offset)
    val run2 = runOnce(cp2)
    assert(run2.map(_.getLong(0)).toSet.subsetOf(expect1 ++ (11L to 15L)) &&
      expect1.subsetOf(run2.map(_.getLong(0)).toSet),
      s"replayed MoR batch must re-deliver: ${run2.map(_.getLong(0)).sorted}")
    // the replayed rows carry correct VALUES through the
    // reconstruction (not just the right keys)
    assert(run2.forall(r => r.getLong(1) == r.getLong(0) * 2))
    val run3 = runOnce(cp2)
    assert((run2 ++ run3).map(_.getLong(0)).toSet == expect1 ++ (11L to 15L),
      s"S2 must arrive by the next trigger: ${(run2 ++ run3).map(_.getLong(0)).sorted}")
    // equality deletes in an expired snapshot's recorded manifests stay
    // LOUD (their ordering died with the list's sequence numbers) —
    // driven directly at the Source API, which throws at plan time
    val eqDir = Files.createTempDirectory("istream_fb_eq").toFile.getAbsolutePath
    Seq(Tuple1(2L)).toDF("k").coalesce(1).write.mode("overwrite").parquet(eqDir)
    val eq = new java.io.File(eqDir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val mEq = IcebergRead.Fixture.manifestV2(dir, "meq.avro", Seq(
      EntryInfo(1, eq, 2, 0L, Seq(1))))
    val src = new IcebergStreamSource(spark, dir)
    val offEq = SerializedOffset(
      s"""{"sid":98,"pos":1,"manifests":["$mEq"]}""")
    val e = intercept[IllegalStateException](src.getBatch(None, offEq))
    assert(e.getMessage.contains("equality deletes"), e.getMessage)
  }

  test("iceberg stream source: offsets carry list seqs — expired eq-delete snapshots reconstruct") {
    // r13 ADVICE (the medium): v2 writers store NULL sequence_number on
    // ADDED manifest entries and readers inherit the manifest-LIST
    // entry's value. An expired-snapshot recovery replay used to
    // reconstruct from bare manifest names, dropping every inherited
    // seq to 0 — data rows would look older than every delete and
    // over-delete. Offsets now record (manifest, list-seq) pairs, so
    // the exact fixture that used to be unreconstructable replays
    // end to end: inherited-seq data at seq 1, inherited-seq equality
    // delete at seq 2, snapshot expired between run and commit.
    import graft.sources.{IcebergRead, IcebergStreamSource}
    import graft.sources.IcebergRead.EntryInfo
    import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = Files.createTempDirectory("istream_seqs").toFile.getAbsolutePath + "/t"
    def writeOne(name: String, schema: StructType, rows: Seq[Row]): String = {
      val tmp = Files.createTempDirectory("iseq_stage").toFile.getAbsolutePath
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.getAbsolutePath
    }
    val dataSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val delSchema = StructType(Seq(StructField("k", LongType, nullable = false)))
    val fData = writeOne("f1.parquet", dataSchema,
      (1L to 10L).map(i => Row(i, i * 2)))
    val fEq = writeOne("eq1.parquet", delSchema, Seq(Row(3L), Row(7L)))
    // nullSeqs: the entries THEMSELVES store null — the inherit shape
    val mData = IcebergRead.Fixture.manifestV2(dir, "mData.avro",
      Seq(EntryInfo(1, fData, 0, 0L, Nil)), nullSeqs = true)
    val mEq = IcebergRead.Fixture.manifestV2(dir, "mEq.avro",
      Seq(EntryInfo(1, fEq, 2, 0L, Seq(1))), nullSeqs = true)
    val l1 = IcebergRead.Fixture.manifestListV2(dir, "snap-50.avro",
      Seq((mData, 1L), (mEq, 2L)))
    IcebergRead.Fixture.metadataMulti(dir, 1, 2, currentSnapshotId = 50L,
      snapshots = Seq((50L, l1)),
      fields = Seq((1, "k", true, "long"), (2, "v", true, "long")))
    // the planned offset records the list seqs alongside the manifests
    val probe = new IcebergStreamSource(spark, dir)
    val off = probe.getOffset.get
    assert(off.json.contains("\"seqs\""), off.json)
    val cp = ckpt()
    def runOnce(at: String): Seq[Row] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = spark.readStream.format("graft-iceberg").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", at)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    val expect1 = (1L to 10L).filterNot(k => k == 3 || k == 7).toSet
    assert(runOnce(cp).map(_.getLong(0)).toSet == expect1,
      "first batch = eq-delete MoR snapshot")
    // crash between run and commit (on a checkpoint copy), then S1
    // expires: supersede the metadata with a list that drops snapshot 50
    val cp2 = ckpt()
    def copyRec(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles()).getOrElse(Array.empty)
          .foreach(f => copyRec(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
    new java.io.File(cp2).delete()
    copyRec(new java.io.File(cp), new java.io.File(cp2))
    assert(new java.io.File(s"$cp2/commits/0").delete(), "commits/0 must exist")
    new java.io.File(s"$cp2/commits/.0.crc").delete()
    val fNew = writeOne("f2.parquet", dataSchema,
      (11L to 13L).map(i => Row(i, i * 2)))
    val mNew = IcebergRead.Fixture.manifestV2(dir, "mNew.avro",
      Seq(EntryInfo(1, fNew, 0, 0L, Nil)), nullSeqs = true)
    val l2 = IcebergRead.Fixture.manifestListV2(dir, "snap-60.avro",
      Seq((mData, 1L), (mEq, 2L), (mNew, 3L)))
    IcebergRead.Fixture.metadataMulti(dir, 2, 2, currentSnapshotId = 60L,
      snapshots = Seq((60L, l2)),
      fields = Seq((1, "k", true, "long"), (2, "v", true, "long")))
    // restart: batch 0 re-executes through the seq-carrying offset —
    // the equality delete applies at its INHERITED seq 2 and only rows
    // 3/7 stay dead; then the S2 increment arrives
    val run2 = runOnce(cp2)
    assert(expect1.subsetOf(run2.map(_.getLong(0)).toSet),
      s"replayed batch must re-deliver the MoR rows: ${run2.map(_.getLong(0)).sorted}")
    assert(!run2.exists(r => r.getLong(0) == 3 || r.getLong(0) == 7),
      "the inherited-seq equality delete must still apply in the replay")
    assert(run2.forall(r => r.getLong(1) == r.getLong(0) * 2))
    val run3 = runOnce(cp2)
    assert((run2 ++ run3).map(_.getLong(0)).toSet == expect1 ++ (11L to 13L),
      s"S2 must arrive by the next trigger: ${(run2 ++ run3).map(_.getLong(0)).sorted}")
    // a pre-r14 offset (no seqs) over the same expired snapshot stays
    // LOUD — any reconstructed entry at seq 0 on a v2 table is an
    // unrecoverable inherited value
    val legacy = SerializedOffset(
      s"""{"sid":50,"pos":1,"manifests":["$mData","$mEq"]}""")
    val src2 = new IcebergStreamSource(spark, dir)
    val e2 = intercept[IllegalStateException](src2.getBatch(None, legacy))
    assert(e2.getMessage.contains("unreconstructable"), e2.getMessage)
  }

  test("iceberg stream source: incremental batches fill v3 initial-defaults like batch reads") {
    // r14 review close: the incremental branch used to scan added
    // files raw, serving nulls where a batch read of the same snapshot
    // serves the declared default
    import graft.sources.{IcebergRead, IcebergStreamSource}
    import graft.sources.IcebergRead.EntryInfo
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = Files.createTempDirectory("istream_def").toFile.getAbsolutePath + "/t"
    val data = Files.createTempDirectory("istream_def_d").toFile.getAbsolutePath
    def stage(name: String, df: org.apache.spark.sql.DataFrame): String = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$data/$name")
      new java.io.File(s"$data/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    import spark.implicits._
    val newSchema = StructType(Seq(
      StructField("k", LongType), StructField("tag", StringType)))
    val f1 = stage("f1", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "one")), 1), newSchema))
    val m1 = IcebergRead.Fixture.manifest(dir, "m1.avro", Seq((1, f1, 0)))
    val l1 = IcebergRead.Fixture.manifestList(dir, "snap-1.avro", Seq(m1))
    val fields = Seq((1, "k", true, "long"), (2, "tag", false, "string"))
    val dflts = Map("tag" -> "\"legacy\"")
    IcebergRead.Fixture.metadataMulti(dir, 1, 3, currentSnapshotId = 1L,
      snapshots = Seq((1L, l1)), fields = fields, fieldDefaults = dflts)
    val cp = ckpt()
    def runOnce(): Seq[Row] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = spark.readStream.format("graft-iceberg").load(dir)
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= b.collect() }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(); got.toSeq
    }
    assert(runOnce().map(r => (r.getLong(0), r.getString(1))) == Seq((1L, "one")))
    // S2 appends an OLD-SCHEMA file (no `tag` column): the increment
    // must serve the default, exactly like a batch read would
    val f2 = stage("f2", Seq(2L, 3L).toDF("k"))
    val m2 = IcebergRead.Fixture.manifest(dir, "m2.avro", Seq((1, f2, 0)))
    val l2 = IcebergRead.Fixture.manifestList(dir, "snap-2.avro", Seq(m1, m2))
    IcebergRead.Fixture.metadataMulti(dir, 2, 3, currentSnapshotId = 2L,
      snapshots = Seq((1L, l1), (2L, l2)), fields = fields, fieldDefaults = dflts)
    val run2 = runOnce().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(run2 == Set((2L, "legacy"), (3L, "legacy")),
      s"the increment must fill initial-defaults: $run2")
    assert(IcebergRead.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "one"), (2L, "legacy"), (3L, "legacy")),
      "stream ≡ batch on the same snapshot")
  }
}
