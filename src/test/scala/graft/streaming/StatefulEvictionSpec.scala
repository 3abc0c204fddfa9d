package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** E32 state-boundedness oracle: per-user flatMapGroupsWithState state
  * must be evicted once the watermark passes the key's idle horizon —
  * mirror of the streamDedup eviction fix (64a70b0). Proof of removal is
  * behavioral: a user who returns after expiry restarts from zero. */
class StatefulEvictionSpec extends SparkSpec {

  test("idle key's state is evicted after the watermark passes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.EventRow]
    val out = StreamOps.statefulTransform(input.toDS())
    val q = out.writeStream.format("memory").queryName("stateful_evict")
      .outputMode("append").start()
    try {
      def ev(id: Long, time: String, user: Long, v: Double) =
        StreamOps.EventRow(id, Timestamp.valueOf(time), user, "click", v)
      // batch 1: user 1 at 10:00 — timeout horizon lands at 11:00
      input.addData(ev(1, "2024-01-01 10:00:00", 1L, 1.0))
      q.processAllAvailable()
      // batch 2: user 2 at 14:00 — end-of-batch watermark becomes 13:00
      input.addData(ev(2, "2024-01-01 14:00:00", 2L, 5.0))
      q.processAllAvailable()
      // batch 3: another user-2 event; during this batch the 13:00
      // watermark exceeds user 1's 11:00 horizon and user 1 has no data,
      // so the timeout fires and the state is removed (silently)
      input.addData(ev(3, "2024-01-01 14:05:00", 2L, 5.0))
      q.processAllAvailable()
      // batch 4: user 1 returns — evicted state must restart from zero
      input.addData(ev(4, "2024-01-01 14:30:00", 1L, 7.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("stateful_evict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.contains((1L, 1L, 1.0)), s"first visit: $rows")
    assert(rows.contains((1L, 1L, 7.0)),
      s"state must restart at n=1 after eviction: $rows")
    assert(!rows.contains((1L, 2L, 8.0)),
      s"stale state survived the watermark: $rows")
    // expiry itself must emit nothing (output equivalence with batch)
    assert(rows.count(_._1 == 1L) == 2, s"timeout emitted rows: $rows")
  }
}
