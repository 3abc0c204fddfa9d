package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming index maintenance oracle: codes appended incrementally over
  * several microbatches must equal the batch encoding of the same rows —
  * stream/batch equivalence for the index pipeline. */
class StreamingIndexSpec extends SparkSpec {

  test("incremental PQ encoding ≡ batch encoding, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val books = graft.operators.Pq.trainCodebooks(emb, "vec_id", "embedding")
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()

    val out = Files.createTempDirectory("sidx_out").toString
    val ckpt = Files.createTempDirectory("sidx_ckpt").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingIndex.encodeStream(
      input.toDF().toDF("vec_id", "embedding"), books, out, ckpt)
    try {
      // three arrival waves
      rows.grouped(math.max(1, rows.length / 3)).foreach { wave =>
        input.addData(wave.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = EosSink.readCommitted(spark, out)
      .select(col("vec_id"), col("pq_codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val batch = graft.operators.Pq.encode(emb, "embedding", books)
      .select("vec_id", "pq_codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(streamed.size === rows.length, "every vector exactly once")
    assert(streamed === batch, "stream/batch encoding equivalence")
  }
}
