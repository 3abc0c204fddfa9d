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
