package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{IdentityFunction, UppercaseFunction}
import graft.model.RiffMessage
import graft.serde.RiffWire

/** End-to-end parity pipeline over a MemoryStream: framed bytes → decode →
  * function → encode → sink, mirroring the reference's uppercase demo. */
class BridgeSpec extends SparkSpec {

  private def frame(text: String, headers: Map[String, Seq[String]]) =
    RiffWire.encode(RiffMessage(headers, text.getBytes(StandardCharsets.UTF_8)))

  test("uppercase bridge over a streaming source (R1-R7 shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    val framed = input.toDF().select(col("value"))
    val out = Bridge.transform(spark, framed, UppercaseFunction)
    val q = out.writeStream.format("memory").queryName("bridge_out")
      .outputMode("append").start()
    try {
      input.addData(
        frame("Hello", Map("Content-Type" -> Seq("text/plain"))),
        frame("World", Map("Accept" -> Seq("*/*"))))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("bridge_out").collect()
    assert(rows.length === 2)
    val decoded = rows.map { r =>
      assert(r.isNullAt(0), "reference produces null keys")
      RiffWire.decode(r.getAs[Array[Byte]]("value"))
    }
    val texts = decoded.map(m => new String(m.payload, StandardCharsets.UTF_8))
    assert(texts.toSet === Set("HELLO", "WORLD"))
    assert(decoded.flatMap(_.headers.keys).toSet ===
      Set("Content-Type", "Accept"), "headers pass through")
  }

  test("identity function is byte-preserving (grpc.enabled=false parity)") {
    import spark.implicits._
    val f = frame("payload-bytes", Map("k" -> Seq("v1", "v2")))
    val df = Seq(f, f).toDF("value")
    val obs = new org.apache.spark.sql.Observation("bridge_tap")
    val out = Bridge.transform(spark, df, IdentityFunction, Some(obs)).collect()
    assert(java.util.Arrays.equals(out.head.getAs[Array[Byte]]("value"), f))
    // R8 debug-tap parity: side-channel metrics without a second pass
    assert(obs.get("n_records") === 2L)
    assert(obs.get("n_bytes") === 2L * f.length)
  }

  test("R8 tap works on the streaming side via query progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    val out = Bridge.transform(spark, input.toDF().select(col("value")),
      IdentityFunction, tapName = Some("bridge_stream_tap"))
    val q = out.writeStream.format("memory").queryName("bridge_tap_out")
      .outputMode("append").start()
    try {
      input.addData(frame("one", Map()), frame("two", Map()),
        frame("three", Map()))
      q.processAllAvailable()
      val metrics = q.lastProgress.observedMetrics.get("bridge_stream_tap")
      assert(metrics != null, "observed metrics must surface in progress")
      assert(metrics.getAs[Long]("n_records") === 3L)
    } finally q.stop()
  }

  test("poison frame fails the task like MessageDeserializer's assert") {
    import spark.implicits._
    val df = Seq(Array[Byte](0x01, 0x02)).toDF("value")
    val e = intercept[Exception] {
      Bridge.transform(spark, df, IdentityFunction).collect()
    }
    assert(e.getMessage != null)
  }

  test("EosSink: replayed batchId is dropped (exactly-once)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eos").toString
    val sink = new EosSink(dir)
    sink.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), batchId = 0L)
    // simulate checkpoint replay of the same batch with different content:
    // must be a no-op
    sink.write(Seq((3, "c")).toDF("id", "v"), batchId = 0L)
    val got = spark.read.parquet(s"$dir/batch_0").collect()
    assert(got.length === 2)
    assert(sink.isCommitted(0L))
    // a new batch id lands normally
    sink.write(Seq((3, "c")).toDF("id", "v"), batchId = 1L)
    assert(spark.read.parquet(s"$dir/batch_1").count() === 1)
  }

}
