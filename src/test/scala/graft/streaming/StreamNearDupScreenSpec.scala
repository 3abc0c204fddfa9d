package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming ingest screen must be ROW-IDENTICAL to the batch
  * delta verdicts (r14 verdict #8): `dup_of_index` is a per-doc
  * property of the arrival vs the STATIC day-1 signature index, so
  * replaying the delta through the stream (whatever the
  * micro-batching) and running the batch probe over the same delta
  * must agree doc for doc. */
class StreamNearDupScreenSpec extends SparkSpec {

  test("stream screen verdicts equal the batch probe over the same " +
      "delta, and both flag something at this SF") {
    import graft.operators.IncrementalDedup
    import graft.queries.PipelineQueries
    val streamed = StreamOps.streamNearDupScreen(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val (sigs1, cut) = PipelineQueries.corpusIncrementalIndex(spark, sf)
    val delta = PipelineQueries.qualityGate(
      graft.sources.Tables.documents(spark, sf)
        .filter(col("doc_id") >= cut))
    val batch = IncrementalDedup.verdicts(sigs1, delta, "doc_id",
        "text", numHashes = 32, bands = 8, threshold = 0.6)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(streamed == batch,
      s"stream ${streamed.size} rows vs batch ${batch.size}: " +
        s"diff ${(streamed.toSet diff batch.toSet).take(5)}")
    assert(streamed.nonEmpty, "empty delta — fixture regression")
    // the sf0.001 corpus plants cross-generation near-dups: the screen
    // must actually catch some, not just agree on all-false
    assert(streamed.values.exists(identity),
      "no arrival flagged dup_of_index — planted twins missing")
  }
}
