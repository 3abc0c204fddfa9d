package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Supervision-loop parity (SURVEY §2A R9; reference
  * `StreamsApplication.java:135-143`): the reference reacts to a pipeline
  * failure by rebuilding the whole Kafka→gRPC→Kafka flow throttled to one
  * in-flight batch. The Spark analogue: rebuild the `StreamingQuery` from
  * the same checkpoint — the offset WAL replays the failed batch with
  * identical offsets, and an idempotent sink ([[EosSink]]) keeps it
  * exactly-once — and inject source-throttle options on retry attempts
  * (`maxFilesPerTrigger` for file sources, `maxOffsetsPerTrigger` for
  * Kafka) so new batches drain in small increments after a failure
  * instead of re-hitting it at full batch size.
  *
  * @param build       constructs AND starts the query; receives the extra
  *                    source options to apply — empty on the first
  *                    attempt, `throttle` on every retry
  * @param throttle    degraded-mode source options injected after a failure
  * @param maxRestarts retries after the first attempt before rethrowing
  */
final class Supervisor(
    build: Map[String, String] => StreamingQuery,
    throttle: Map[String, String] = Map("maxFilesPerTrigger" -> "1"),
    maxRestarts: Int = 3) {

  /** Drain all currently-available input, restarting on failure; returns
    * the number of restarts performed. An always-on deployment loops
    * `awaitTermination()` in place of `processAllAvailable()` — the
    * restart/throttle policy is identical. */
  def runUntilDrained(): Int = {
    var attempt = 0
    while (attempt <= maxRestarts) {
      val q = build(if (attempt == 0) Map.empty else throttle)
      try {
        q.processAllAvailable()
        q.stop()
        return attempt
      } catch {
        // NonFatal only: OOM/fatal JVM errors and interrupts must
        // propagate, not trigger restarts against a dying JVM
        case scala.util.control.NonFatal(e) =>
          try q.stop() catch { case scala.util.control.NonFatal(_) => () }
          attempt += 1
          if (attempt > maxRestarts) throw e
      }
    }
    attempt
  }
}
