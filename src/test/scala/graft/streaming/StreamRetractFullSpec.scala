package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-artifact takedown closure (q_stream_retract_full, r16
  * verdict #5): one takedown stream must leave BOTH the corpus frames
  * and the vector index. The positive half runs the registered gate at
  * sf0.001; the negative half proves the gate has TEETH — a takedown
  * that reaches the frames but MISSES one index row flips that probe's
  * byte-equality verdict (the planted copies score minimal ADC, so a
  * leftover cannot hide in the tail of the top-k). */
class StreamRetractFullSpec extends SparkSpec {
  import graft.operators.IvfPq
  import graft.queries.{PipelineQueries => PQ}

  test("the registered gate verdicts are all true at sf0.001 (streamed " +
      "frames == one-shot batch; final index == never-appended base)") {
    val rows = StreamOps.streamRetractFull(spark, sf)
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(rows.size == 6, rows.toString)
    assert(rows.values.forall(identity), rows.toString)
  }

  test("a missed index retraction flips the victim probe's verdict " +
      "(the gate cannot green a store that forgot to forget)") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") < 5)
    val voff = emb.agg(max(col("vec_id")).cast("long"))
      .head.getLong(0) + 1
    // plant copies of probes 0 and 1; "forget" only probe 0's copy
    val twins = probes.filter(col("vec_id") < 2)
      .select((col("vec_id") + voff).as("vec_id"), col("embedding"))
    val base = PQ.ivfPqIndex(spark, sf)
    val leaky = IvfPq.retract(
      IvfPq.append(base, twins, m = PQ.PqM, k = PQ.PqKCodes),
      Seq(voff).toDF("vec_id"))
    def top(i: IvfPq.Index) =
      IvfPq.search(i, probes, k = 10, nprobe = PQ.IvfPqNprobe,
        m = PQ.PqM, kCodes = PQ.PqKCodes)
        .select("probe_id", "cand_id", "adc")
    val badProbes = top(base).exceptAll(top(leaky))
      .unionAll(top(leaky).exceptAll(top(base)))
      .select("probe_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // probe 1's leftover copy breaks byte-equality; probe 0's was
    // properly retracted and stays identical
    assert(badProbes.contains(1L), badProbes.toString)
    assert(!badProbes.contains(0L), badProbes.toString)
  }
}
