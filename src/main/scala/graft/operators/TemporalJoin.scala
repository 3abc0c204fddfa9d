package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time (temporal) join: attach to each fact row the dimension
  * VERSION that was valid at the fact's own time — the lookup every
  * SCD2-style history table ([[CorpusDiff.scd2]]) exists to serve, and
  * the join shape behind feature-store "as of event time" reads.
  *
  * Semantics per fact row `(key, t)`: the matching dimension row is the
  * one with the same key whose validity interval contains `t` —
  * `valid_from <= t` and (`valid_to IS NULL` or `t < valid_to`;
  * `t <= valid_to` when `inclusiveEnd`, matching [[CorpusDiff.scd2]]'s
  * inclusive last-observed-version convention). No containing interval
  * (fact predates the first version, or the entity was deleted) →
  * carried columns are null, left-join style. Validity intervals are
  * assumed non-overlapping per key — the SCD2 invariant; overlaps would
  * make "the" valid version ill-defined.
  *
  * Spark-first shape: because intervals are non-overlapping, the ONLY
  * candidate interval is the latest `valid_from <= t` — exactly an
  * as-of join. We plan the first-class sort-merge [[AsOfJoin]] node
  * (one narrow shuffle per side, O(1) merge state — no interval
  * explosion, no range-join fallback to BroadcastNestedLoop) and apply
  * the expiry check on the carried `valid_to` as a map-only projection
  * afterwards. At 100 TB the dimension history shuffles as
  * (key, valid_from, valid_to, carried) rows once; facts shuffle once
  * on the key.
  */
object TemporalJoin {

  /** @param facts        probe side (events/transactions)
    * @param dim          SCD2-style dimension history
    * @param key          equi-key column present on both sides
    * @param factTime     fact-side time column
    * @param validFrom    dimension interval start (inclusive)
    * @param validTo      dimension interval end; null = still current
    * @param carry        dimension columns to attach (each emitted as
    *                     `asof_<name>`)
    * @param inclusiveEnd interval end convention: false = half-open
    *                     `[from, to)` (the warehouse-standard SCD2
    *                     encoding where `to` equals the successor's
    *                     `from`); true = closed `[from, to]`
    *                     ([[CorpusDiff.scd2]]'s last-observed-version
    *                     encoding)
    * @return every `facts` row + `asof_valid_from`/`asof_valid_to` of the
    *         matched interval and `asof_<carry>` columns (all null when
    *         no interval contains the fact time)
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, key: String,
      factTime: String, validFrom: String, validTo: String,
      carry: Seq[String], inclusiveEnd: Boolean = false): DataFrame = {
    require(!carry.contains(validFrom) && !carry.contains(validTo),
      "carry must not repeat the validity columns; they are always carried")
    val factCols = facts.columns.toIndexedSeq
    // carry validFrom itself so "some interval started at or before t"
    // is testable without relying on a nullable payload column
    val carryAll = validFrom +: validTo +: carry
    val joined = AsOfJoin(facts, dim, key, factTime, validFrom, carryAll)
    val matched = col(s"asof_$validFrom").isNotNull
    val live: Column = {
      val to = col(s"asof_$validTo")
      val t = col(factTime)
      if (inclusiveEnd) to.isNull || t <= to else to.isNull || t < to
    }
    val keep = matched && live
    joined.select(
      factCols.map(col) ++
        carryAll.map(c =>
          when(keep, col(s"asof_$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
