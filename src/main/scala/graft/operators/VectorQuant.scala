package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of an embedding column — the storage form a
  * 100 TB vector corpus actually ships (4-8× smaller than raw floats,
  * exact-arithmetic reconstruction contract, unlike PQ whose codes are
  * centroid indices). Symmetric per-vector scheme: `scale = max|x|/127`,
  * `code = ⌊x/scale + 0.5⌋ ∈ [-127, 127]`, reconstruction `code·scale`.
  *
  * Everything is closed-form double arithmetic — deterministic across
  * engines, so the driver gate hash-matches codes and reconstruction
  * error against DuckDB (no tolerance needed; contrast PQ/IVF whose
  * oracles are recall-style). `⌊x/s + 0.5⌋` rather than `round()`:
  * half-up vs half-even rounding differs between engines at exact .5
  * quotients, floor(+0.5) does not.
  *
  * Scale shape: ONE map-only projection per direction — no shuffle, no
  * state; quantizing 100 TB costs one read and a narrower write.
  */
object VectorQuant {

  /** Append (`sq_scale`: double, `sq_codes`: array<int> in [-127,127]).
    * A zero vector quantizes to scale 0 with all-zero codes. */
  def quantize(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("sq_scale",
        array_max(transform(col(vecCol), x => abs(x.cast("double"))))
          / lit(127d))
      .withColumn("sq_codes", transform(col(vecCol), x =>
        when(col("sq_scale") === 0d, lit(0L))
          .otherwise(floor(x.cast("double") / col("sq_scale") + lit(0.5d)))
          .cast("int")))

  /** Reconstruction: `code · scale` per dimension, array<double>. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)
}
