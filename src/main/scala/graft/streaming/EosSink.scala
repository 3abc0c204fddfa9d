package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Exactly-once sink parity (SURVEY §2A R7, §7.4 hard-part 1).
  *
  * The reference commits output records and consumer offsets in one Kafka
  * transaction per batch (`StreamsApplication.java:146-150`), aborting once
  * on failure and rebuilding the pipeline (:151-163). Structured
  * Streaming's Kafka sink is at-least-once; the Spark-native equivalent is
  * a `foreachBatch` sink made idempotent on `batchId` — the checkpoint
  * replays a failed batch with the SAME id, and the sink discards
  * re-deliveries, yielding end-to-end exactly-once. Semantics delta vs the
  * reference (documented, by design): replay-and-discard instead of
  * abort-and-reread; both produce each record's effect exactly once.
  *
  * The commit protocol is the classic two-phase rename: write to a
  * temporary dir, then atomically record the batch as committed. A batch
  * directory without a COMMIT marker is garbage from a crashed attempt and
  * is overwritten on retry.
  */
final class EosSink(outDir: String) extends Serializable {

  private def commitMarker(batchId: Long) =
    Paths.get(s"$outDir/_committed_$batchId")

  def isCommitted(batchId: Long): Boolean = Files.exists(commitMarker(batchId))

  /** foreachBatch body: `writer.foreachBatch(sink.write _)`. */
  def write(batch: DataFrame, batchId: Long): Unit = {
    if (isCommitted(batchId)) return // replayed batch — drop, exactly-once
    Files.createDirectories(Paths.get(outDir))
    batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
    Files.createFile(commitMarker(batchId)) // atomic commit point
  }
}
