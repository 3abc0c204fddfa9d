package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Pq

/** Streaming index maintenance: newly-arriving embeddings are PQ-encoded
  * per microbatch against FIXED pre-trained codebooks and appended to the
  * codes table through the idempotent [[EosSink]] — the production shape
  * for keeping an ANN index current while a 100 TB corpus grows.
  *
  * Design points:
  *  - codebooks are an immutable broadcast artifact (training is a batch
  *    job; re-training is a new index generation, not an in-place edit),
  *    so encoding each batch is a pure projection — the stream never
  *    shuffles;
  *  - appends ride the `batchId`-idempotent sink: a crashed batch replays
  *    with the same id and is discarded, so the codes table holds every
  *    vector exactly once across restarts (RestartRecoverySpec /
  *    SupervisorSpec semantics);
  *  - readers use [[EosSink.readCommitted]] and never observe a torn
  *    append.
  */
object StreamingIndex {

  /** Start encoding a stream of (idCol, vecCol) rows into `outDir`.
    * `books` is a trained codebook table ([[Pq.trainCodebooks]]). */
  def encodeStream(vecs: DataFrame, books: DataFrame, outDir: String,
      checkpoint: String, idCol: String = "vec_id",
      vecCol: String = "embedding", m: Int = 8, k: Int = 16)
      : StreamingQuery = {
    val sink = new EosSink(outDir)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink.write(Pq.encode(batch.toDF(), vecCol, books, m, k)
          .select(idCol, "pq_codes"), id)
      }
      .start()
  }
}
