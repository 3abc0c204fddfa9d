package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequenceSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed assignment equals the single-partition row_number") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "ts")
    val got = Sequence.assignGlobalSeq(ev, to_date(col("ts")),
      Seq(col("ts"), col("event_id")))
    val want = ev.withColumn("seq",
      row_number().over(Window.orderBy(col("ts"), col("event_id"))) - 1)
    assert(got.select("event_id", "seq")
      .exceptAll(want.select("event_id", "seq")).isEmpty)
    // contiguity: 0..N-1 with no gaps
    val n = ev.count()
    val agg = got.agg(min("seq"), max("seq"), countDistinct("seq")).head()
    assert(agg.getLong(0) == 0L && agg.getLong(1) == n - 1 &&
      agg.getLong(2) == n)
  }

  test("null buckets keep their rows and sequence first") {
    val df = Seq((Some(2), 10L), (None, 11L), (Some(1), 12L), (None, 13L))
      .toDF("bk", "id")
    val got = Sequence.assignGlobalSeq(df, col("bk"), Seq(col("id")))
      .orderBy("seq").select("id").as[Long].collect().toSeq
    // nulls-first bucket order: ids 11,13 then bucket 1 then bucket 2
    assert(got == Seq(11L, 13L, 12L, 10L))
  }

  test("skewed buckets: one bucket holding most rows still contiguous") {
    val df = (Seq.fill(50)(1) ++ Seq(2, 2, 3)).zipWithIndex
      .map { case (b, i) => (b, i.toLong) }.toDF("bk", "id")
    val got = Sequence.assignGlobalSeq(df, col("bk"), Seq(col("id")))
      .orderBy("seq").select("bk", "id").as[(Int, Long)].collect()
    val want = df.orderBy("bk", "id").as[(Int, Long)].collect()
    assert(got.toSeq == want.toSeq)
  }
}
