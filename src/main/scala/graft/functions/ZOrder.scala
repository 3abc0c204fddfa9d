package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-column locality key that
  * completes the layout toolkit ([[graft.sources.Layout]] covers
  * single-column partition pruning and join-key bucketing): sorting a
  * table by the interleaved bits of two or more columns clusters rows
  * that are close in EVERY dimension into the same files, so min/max
  * file statistics prune scans for predicates on ANY prefix-free subset
  * of those columns — the data-skipping discipline Delta/Iceberg expose
  * as `OPTIMIZE ZORDER BY`, here as a plain deterministic column.
  *
  * Pure closed-form bit arithmetic (shifts/and/or over longs), fully
  * codegen'd, map-only — and reproducible in any engine, so the driver
  * gate hash-matches the key values against DuckDB computing the same
  * formula.
  *
  * Callers pre-scale each dimension into `[0, 2^bits)` (quantile-bucket
  * or modulo, as the gate query's `pmod` does): only the low `bits`
  * bits participate, so larger values alias onto the same key and
  * negative values (arithmetic shift) key as all-ones — pre-scaling is
  * the caller's contract, not checked per row (a per-row range check
  * would put a branch in front of 63 bit ops).
  */
object ZOrder {

  /** Interleave `bits` low bits of each column: bit `b` of column `c`
    * lands at output position `b * n + c` (column 0 least significant).
    * `n * bits` must fit a long (≤ 63). */
  def zorderKey(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a long")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_ + _)
  }
}
