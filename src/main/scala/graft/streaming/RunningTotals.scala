package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key running totals on the Spark 4 `transformWithState` API — the
  * successor to `flatMapGroupsWithState` (typed state handles, TTL,
  * timers, RocksDB-backed): the SAME running count/sum contract as
  * [[StreamOps.statefulTransform]], re-expressed on the modern surface so
  * the engine demonstrates both state APIs side by side.
  *
  * Determinism contract: rows inside a microbatch arrive unordered, so
  * the processor sorts each key's batch by (ts, event_id) before folding
  * — per-event emission order is then total, and the running sums are
  * INTEGER cents, so the fold is order-independent arithmetic and the
  * batch oracle is a plain cumulative window (no recursive-CTE walk
  * needed, unlike the EMA gate's chained doubles).
  *
  * State: one (count, cents) pair per key in a `ValueState` with
  * `TTLConfig.NONE` for the replay gate (the driver replays a bounded
  * log); a long-running deployment passes a TTL so idle keys age out of
  * the store — the declarative twin of the timeout-eviction pattern in
  * [[StreamOps.statefulTransform]]. */
object RunningTotals {

  case class In(user_id: Long, event_id: Long, ts: Timestamp, cents: Long)
  case class Out(user_id: Long, event_id: Long, ts: Timestamp,
      n_so_far: Long, cents_so_far: Long)

  class Processor(ttl: TTLConfig) extends StatefulProcessor[Long, In, Out] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.product[(Long, Long)], ttl)

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      var (n, c) = if (totals.exists()) totals.get() else (0L, 0L)
      val out = sorted.map { e =>
        n += 1; c += e.cents
        Out(e.user_id, e.event_id, e.ts, n, c)
      }
      totals.update((n, c))
      out.iterator
    }
  }

  /** Streaming plan over the replay source: one output row per event
    * carrying that user's running totals SO FAR in (ts, event_id)
    * order. */
  def plan(spark: SparkSession, dir: String,
      ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    import spark.implicits._
    StreamOps.replayEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .as[In]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(ttl), TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  /** Replay to a memory sink under the RocksDB state store provider
    * (`transformWithState` requires it; the conf is set only for this
    * stream's construction window and restored immediately — the
    * [[StreamOps.runToMemory]] conf discipline). */
  def replay(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      StreamOps.runToMemory(spark, plan(spark, dir), OutputMode.Append())
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
