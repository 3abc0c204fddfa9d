package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the versioning primitive of an evolving
  * training corpus: given two snapshots of the same logical table,
  * classify every id as `added` / `removed` / `changed` / `unchanged`.
  * Incremental pipeline runs (re-embed only changed docs, re-dedup only
  * the delta, invalidate downstream shards that touched removed ids)
  * hang off exactly this classification; recomputing the world per
  * snapshot is the thing a 100 TB corpus cannot afford.
  *
  * Scale shape: each side is reduced AT THE SCAN to (id, content hash)
  * — text never enters the join — then ONE full-outer equi-join on id
  * decides the status per row. No window, no state, no driver
  * materialization; the join shuffles 40-byte rows. Content equality is
  * by digest (`sha2-256` default, `md5` when cross-engine reproducibility
  * matters — the driver oracle's choice), the [[Dedup]] convention.
  */
object CorpusDiff {

  /** Per-id classification: (idCol, status) for every id present in
    * either snapshot; `unchanged` rows are emitted too (filter them out
    * for a sparse delta — kept here so audits can count all four
    * classes in one pass). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCol: String,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        sha2(_, 256)): DataFrame = {
    val o = oldDf.select(col(idCol), hasher(col(contentCol)).as("__ho"))
    val n = newDf.select(col(idCol), hasher(col(contentCol)).as("__hn"))
    o.join(n, Seq(idCol), "full")
      .select(col(idCol),
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") === col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Apply a sparse delta to a snapshot — the write side of the
    * versioning loop (the MERGE/upsert of a table format, expressed as
    * plain relational ops): `upserts` replace or insert their ids,
    * `deletes` tombstone theirs, and DELETES WIN on overlap (a
    * tombstone is final — re-adding requires a later upsert). Returns
    * the next snapshot with `snapshot`'s schema ( `upserts` must share
    * it).
    *
    * Scale shape: ONE anti-join of the snapshot against the delta ids
    * (delta ids are small → AQE broadcasts them; the 100 TB snapshot
    * never shuffles) plus a union with the filtered upserts. No window,
    * no state; rewriting only delta-touched partitions is the table
    * format's job below this operator. */
  def merge(snapshot: DataFrame, upserts: DataFrame, deletes: DataFrame,
      idCol: String): DataFrame = {
    val doomed = upserts.select(col(idCol))
      .unionAll(deletes.select(col(idCol))).distinct()
    snapshot.join(doomed, Seq(idCol), "left_anti")
      .unionAll(upserts.join(deletes.select(col(idCol)).distinct(),
        Seq(idCol), "left_anti"))
  }

  /** SCD2 history build — the longitudinal form of [[diff]]: given a
    * STACK of snapshots `(id, content, version)` (each version listing
    * the ids present in it), emit one row per (id, contiguous run of
    * identical content) with `[valid_from, valid_to]` version bounds.
    * `valid_to` is null on open rows; `is_current` marks runs alive in
    * the latest version. A changed doc closes its run and opens a new
    * one; a REMOVED doc's run closes at its last observed version; a
    * re-added id opens a fresh run even if content returns unchanged
    * (the gap is real history — slowly-changing-dimension type 2).
    *
    * Scale shape: each observation reduces AT THE SCAN to (id, version,
    * digest) — content never shuffles — then one id-keyed window pass
    * (lag + running sum = the standard gaps-and-islands reduction) and
    * one (id, run) aggregate, all on the same id-hash partitioning; the
    * latest-version bound is a 1-row broadcast. Per-id row count is the
    * snapshot count, so window state stays trivially bounded.
    *
    * Returns (idCol, content_hash, valid_from, valid_to, is_current). */
  def scd2(history: DataFrame, idCol: String, contentCol: String,
      versionCol: String,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        sha2(_, 256)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = history.select(col(idCol),
      col(versionCol).cast("bigint").as("__v"),
      hasher(col(contentCol)).as("content_hash"))
    val w = Window.partitionBy(idCol).orderBy("__v")
    val runs = obs
      .withColumn("__ph", lag("content_hash", 1).over(w))
      .withColumn("__pv", lag("__v", 1).over(w))
      .withColumn("__start", when(col("__ph").isNull
        .or(col("__ph") =!= col("content_hash"))
        .or(col("__pv") =!= col("__v") - 1), 1).otherwise(0))
      .withColumn("__run", sum("__start").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val latest = history
      .agg(max(col(versionCol).cast("bigint")).as("__latest"))
    runs.groupBy(col(idCol), col("__run"), col("content_hash"))
      .agg(min("__v").as("valid_from"), max("__v").as("__vto"))
      .crossJoin(broadcast(latest))
      .select(col(idCol), col("content_hash"), col("valid_from"),
        when(col("__vto") === col("__latest"), lit(null).cast("bigint"))
          .otherwise(col("__vto")).as("valid_to"),
        (col("__vto") === col("__latest")).as("is_current"))
  }

  /** Audit rollup: one row per status with count and an
    * order-independent id checksum (xor of hashed ids — the
    * [[graft.sources.Layout]] fingerprint recipe), so two engines agree
    * on WHICH ids changed, not just how many. `idHasher` defaults to
    * xxhash64 (dispersion); pass identity when the checksum must be
    * reproducible outside the JVM (DuckDB has no xxhash64 — the driver
    * oracle xors raw ids). */
  def summary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCol: String,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        sha2(_, 256),
      idHasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_)): DataFrame =
    diff(oldDf, newDf, idCol, contentCol, hasher)
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        bit_xor(idHasher(col(idCol))).as("id_checksum"))
}
