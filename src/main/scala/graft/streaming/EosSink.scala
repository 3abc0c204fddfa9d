package graft.streaming

import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * Commit protocol: write the batch directory, then create a `_committed_`
  * marker as the atomic commit point. A batch directory WITHOUT its marker
  * is garbage from a crashed attempt — it is overwritten on retry, and
  * readers must filter on markers (use [[EosSink.readCommitted]], which
  * does). A concurrent zombie attempt that commits between the
  * `isCommitted` check and marker creation makes `createFile` throw
  * `FileAlreadyExistsException`; both attempts wrote identical data for
  * the same batchId (Spark replays deterministically from the checkpoint),
  * so the race is benign and treated as commit success.
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
    try Files.createFile(commitMarker(batchId)) // atomic commit point
    catch { case _: FileAlreadyExistsException => () } // lost a benign race
  }
}

object EosSink {

  /** Ids of committed batches, from the `_committed_` markers. */
  def committedBatchIds(outDir: String): Seq[Long] = {
    val dir = Paths.get(outDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val stream = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("_committed_"))
        .map(_.stripPrefix("_committed_").toLong)
        .toSeq.sorted
    } finally stream.close()
  }

  /** Read ONLY committed batches — the reader counterpart of the marker
    * protocol. Listing `batch_*` dirs directly can observe data from a
    * crashed, uncommitted attempt; this filters on the commit markers. */
  def readCommitted(spark: SparkSession, outDir: String): DataFrame = {
    val dirs = committedBatchIds(outDir).map(id => s"$outDir/batch_$id")
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs: _*)
  }
}
