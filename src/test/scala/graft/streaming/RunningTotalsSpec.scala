package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSpec

/** State-continuity oracle for the `transformWithState` processor: the
  * running totals must CONTINUE across microbatches (the thing the state
  * store exists for), not reset per batch. */
class RunningTotalsSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("running totals continue across microbatches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      val input = MemoryStream[RunningTotals.In]
      val out = input.toDS().groupByKey(_.user_id)
        .transformWithState(
          new RunningTotals.Processor(
            org.apache.spark.sql.streaming.TTLConfig.NONE),
          TimeMode.None(), OutputMode.Append())
      val q = out.toDF().writeStream.format("memory")
        .queryName("tws_out").outputMode("append").start()
      try {
        // batch 1: two events for user 1 (out of order — processor sorts)
        input.addData(
          RunningTotals.In(1L, 2L, ts(20), 100L),
          RunningTotals.In(1L, 1L, ts(10), 30L))
        q.processAllAvailable()
        // batch 2: one more for user 1 plus a fresh user 2
        input.addData(
          RunningTotals.In(1L, 3L, ts(30), 5L),
          RunningTotals.In(2L, 4L, ts(10), 7L))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == Set(
        (1L, 1L, 1L, 30L),   // batch-1 fold in (ts, id) order
        (1L, 2L, 2L, 130L),
        (1L, 3L, 3L, 135L),  // batch 2 CONTINUES user 1's state
        (2L, 4L, 1L, 7L)), s"got $got")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("replay matches the batch cumulative window at sf") {
    val got = RunningTotals.replay(spark, sf)
    val expect = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .withColumn("n_so_far", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("ts", "event_id")
          .rowsBetween(Long.MinValue, 0)))
      .withColumn("cents_so_far", sum("cents").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("ts", "event_id")
          .rowsBetween(Long.MinValue, 0)))
      .select("user_id", "event_id", "ts", "n_so_far", "cents_so_far")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "streaming running totals must equal the batch window")
  }
}
