package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** The Spark-4 `transformWithState` arbitrary-state API
  * (StatefulProcessor + typed state variables over the RocksDB state
  * store) — the successor to `flatMapGroupsWithState` that
  * [[EventStreams.customSessionize]] uses. This face keeps a running
  * per-user (count, cent-sum) in a `ValueState` and emits the updated
  * totals per touched key each micro-batch; after the stream drains,
  * the latest emission per key IS the batch aggregate
  * (StreamingSpec asserts equality), and state survives across
  * batches by construction.
  *
  * Scale: state is O(keys) in RocksDB (spillable, incremental
  * checkpoints — the store that makes 10⁹-key state feasible), each
  * batch touches only its own keys, and the emitted updates are
  * Update-mode deltas a downstream upsert sink applies idempotently.
  */
object StateApi {

  final case class UserEvent(user_id: Long, cents: Long)
  final case class RunningTotal(user_id: Long, n_events: Long, sum_cents: Long)

  class RunningAggProcessor
      extends StatefulProcessor[Long, UserEvent, RunningTotal] {

    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)](
        "running", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[RunningTotal] = {
      var (n, sum) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { e => n += 1; sum += e.cents }
      state.update((n, sum))
      Iterator.single(RunningTotal(key, n, sum))
    }
  }

  /** Running per-user totals over an event stream. */
  def runningTotals(events: Dataset[UserEvent]): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningAggProcessor, TimeMode.None(), OutputMode.Update())
  }
}
