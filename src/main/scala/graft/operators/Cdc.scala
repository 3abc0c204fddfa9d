package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE/apply: reconcile a base snapshot with an append-only change
  * feed of upserts and deletes — the lakehouse `MERGE INTO` shape, built
  * from primitives (no table format required): training corpora are
  * refreshed this way (nightly snapshot + day's change stream → next
  * snapshot).
  *
  * Two stages, both key-partitioned:
  *   1. compact the feed to the latest change per key
  *      ([[Compaction.latestByKey]] — a `max_by` hash aggregation, so the
  *      shuffle carries one candidate row per (task, key), never the full
  *      history);
  *   2. ONE full-outer join base⋈changes on the key, then per-row
  *      resolution: latest op `D` drops the row, latest upsert wins over
  *      the base row, base rows without changes pass through, change keys
  *      absent from the base insert.
  *
  * At 100 TB the base is the big side: it shuffles once on the key (or
  * not at all if stored bucketed on it — see [[graft.sources.Layout]]),
  * and the compacted feed is typically small enough for a broadcast. No
  * window sorts, no driver state.
  */
object Cdc {

  /** Apply `changes` to `base`.
    *
    * `changes` must carry: the key columns, `orderCols` (version order,
    * ending in a unique tie-break), `opCol` (a string column equal to
    * `deleteOp` for deletes), and one column per base payload column it
    * updates (same names). Base payload columns absent from `changes`
    * survive upserts unchanged only if `changes` carries them as nulls —
    * this operator treats the change row as the FULL new image (the
    * standard Debezium-style after-image contract), except that columns
    * the feed does not have at all are taken from the base for updated
    * rows.
    *
    * @param keyCols  entity identity in both inputs
    * @param orderCols version columns on `changes`, highest wins
    * @param opCol    operation column on `changes`
    * @param deleteOp `opCol` value meaning delete (everything else =
    *                 upsert with the row's payload as the after-image)
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], orderCols: Seq[String],
      opCol: String, deleteOp: String): DataFrame = {
    val latest = Compaction.latestByKey(changes, keyCols, orderCols)
    val chgPayload = latest.columns
      .filterNot(c => keyCols.contains(c) || c == opCol).toSeq
    val basePayload = base.columns.filterNot(keyCols.contains).toSeq

    val b = basePayload.foldLeft(base)((d, c) =>
      d.withColumnRenamed(c, s"__b_$c"))
    val ch = chgPayload.foldLeft(latest)((d, c) =>
        d.withColumnRenamed(c, s"__c_$c"))
      .withColumnRenamed(opCol, "__c_op")

    val joined = b.join(ch, keyCols, "full")
    val hasChange = col("__c_op").isNotNull
    val isDelete = hasChange && col("__c_op") === lit(deleteOp)

    val out = basePayload.map { c =>
      if (chgPayload.contains(c))
        when(hasChange, col(s"__c_$c")).otherwise(col(s"__b_$c")).as(c)
      else col(s"__b_$c").as(c)
    } ++ chgPayload.filterNot(basePayload.contains)
      .map(c => col(s"__c_$c").as(c))

    joined.filter(!isDelete)
      .select(keyCols.map(col) ++ out: _*)
  }
}
