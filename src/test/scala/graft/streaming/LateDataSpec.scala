package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Watermark late-data semantics (SURVEY §2B E33): records older than
  * watermark - delay are dropped from aggregations once the watermark has
  * advanced past their window. Documented-tolerance check, not
  * hash-matched (the reference has no equivalent; Spark semantics are the
  * contract). */
class LateDataSpec extends SparkSpec {

  test("late event beyond watermark is dropped; in-delay event is kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(sum("v").as("total"))
      .select(col("window.start").as("ws"), col("total"))

    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      // batch 1: events at 10:05 and 10:31 -> watermark advances to 10:21
      input.addData((t(5), 1L), (t(31), 100L))
      q.processAllAvailable()
      // batch 2: 10:07 is < watermark (10:21) and its 10:00 window is
      // closed -> dropped; 10:25 lands in the open 10:20 window -> kept
      input.addData((t(7), 1000L), (t(25), 10000L))
      q.processAllAvailable()
      // batch 3: push watermark far ahead so every window finalizes
      input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 0L))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_out").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(out("2024-01-01 10:00:00.0") === 1L,
      "10:00 window must NOT include the dropped 10:07 late event")
    assert(out("2024-01-01 10:30:00.0") === 100L)
    assert(out("2024-01-01 10:20:00.0") === 10000L,
      "in-delay event within open window is kept")
  }
}
