package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style upsert compaction: collapse an append-only change stream to
  * the latest row per key (the merge-on-read "current state" view every
  * training-data warehouse needs over event feeds).
  *
  * Shape: ONE `max_by(struct(payload), struct(version))` hash aggregation —
  * partial-aggregatable, so each task reduces its rows to one candidate
  * per key map-side and the shuffle carries one row per (task, key). The
  * window formulation (`row_number() OVER (PARTITION BY key ORDER BY
  * version DESC) = 1`) sorts every key's full history instead; at 100 TB
  * of events that sort is the bottleneck, the reduction is not.
  *
  * Determinism: `orderCols` must end in a unique tie-break (e.g. the
  * event id) or concurrent versions pick an arbitrary winner.
  */
object Compaction {

  /** @param keyCols   identity of the entity being upserted
    * @param orderCols version ordering, highest wins; make it total */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(orderCols.map(col): _*)).as("__last"))
      .select(keyCols.map(col) ++
        payload.map(c => col(s"__last.$c").as(c)): _*)
  }
}
