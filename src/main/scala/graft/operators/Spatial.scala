package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial self-join over planar integer coordinates — the
  * grid-bucketing discipline: candidate pairs come from a CELL-equality
  * hash join (cell side length = the query radius, one side exploded to
  * its 3×3 neighborhood), then the exact squared-distance residual
  * filters. No all-pairs product ever forms: cost is Σ per-cell
  * |left|·|right| over the nine neighbor cells, the standard fixed-grid
  * spatial join (the integer, exact-arithmetic cousin of geohash
  * bucketing — at 100 TB the cell id is the shuffle key and density
  * skew is handled like any hot hash key).
  *
  * Integer-only math end to end: coordinates are Longs, distances are
  * exact squared Longs — no floating-point epsilon at cell borders, so
  * a DuckDB brute-force oracle reproduces the output bit-for-bit.
  * In-plan guards reject |coords| > 10⁹ (the headroom proof:
  * dx² + dy² ≤ 2·(2·10⁹)² < 2⁶³) rather than silently overflowing.
  */
object Spatial {
  private val MaxAbsCoord = 1000000000L

  /** Floor division that is exact for negative Longs too (SQL `/` on
    * integers truncates toward zero, which would split a cell that
    * straddles 0 into two). */
  private def floorDiv(c: Column, d: Long): Column =
    (c - pmod(c, lit(d))) / lit(d)

  private def guarded(c: Column, name: String): Column =
    when(abs(c) > MaxAbsCoord, raise_error(concat(
      lit(s"radiusJoin: |$name| > $MaxAbsCoord — rescale coordinates; " +
        "squared distances would overflow Long"), c.cast("string"))))
      .otherwise(c)

  /** All unordered point pairs within `radius` (inclusive, Euclidean)
    * of each other: (id_a, id_b, dist2) with id_a < id_b and
    * dist2 = exact squared distance. `points` must carry unique ids;
    * duplicate ids would double-report pairs.
    *
    * Plan shape: one explode(×9) of the left side, one hash join on
    * (cell_x, cell_y), one codegen residual filter. Each right point
    * lives in exactly ONE home cell, so no pair is emitted twice and
    * no distinct-dedup pass is needed.
    */
  def radiusJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    require(radius >= 1 && radius <= MaxAbsCoord,
      s"radius must be in [1, $MaxAbsCoord]: $radius")
    val p = points.select(
      col(idCol).cast("long").as("id"),
      guarded(col(xCol).cast("long"), xCol).as("x"),
      guarded(col(yCol).cast("long"), yCol).as("y"))
    val home = p
      .withColumn("cx", floorDiv(col("x"), radius).cast("long"))
      .withColumn("cy", floorDiv(col("y"), radius).cast("long"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val probes = home
      .withColumn("o", explode(offsets))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("o.dx")).as("cx"),
        (col("cy") + col("o.dy")).as("cy"))
    val build = home.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    probes.join(build, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= lit(radius * radius))
      .select("id_a", "id_b", "dist2")
  }
}
