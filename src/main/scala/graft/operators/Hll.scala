package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
  * standard linear-counting small-range correction) built from
  * ENGINE-REPRODUCIBLE integer parts — the repo's sketch-gate recipe
  * (CMS / KMV / LogHist precedent): every register is an integer
  * function of the input (md5-derived 32-bit hash, bucket = top p
  * bits, rho = leading-zero rank of the suffix via binary string
  * length), so a DuckDB oracle rebuilds the sketch CELL-FOR-CELL and
  * the estimate — unlike the built-in `approx_count_distinct`, whose
  * HLL++ internals are not reproducible outside the JVM
  * (q_agg_approx_distinct stays rows-only for exactly that reason).
  *
  * Scale shape: map-only hashing, ONE groupBy(bucket) max — the
  * shuffle carries at most m = 2^p rows per partition after partial
  * aggregation. Registers are mergeable by max, the property that
  * makes HLL the distributed-distinct workhorse.
  *
  * FP discipline: the harmonic sum Σ 2^−r is computed EXACTLY in
  * scaled integer space (Σ 2^(25−r) over all m registers, empty = 2^25)
  * — no FP summation; the raw estimate is a fixed IEEE chain over that
  * exact integer, and the final estimate rounds 6dp (the
  * linear-counting branch crosses `ln`, a transcendental — and libm
  * may differ by an ulp across engines).
  */
object Hll {

  /** Precision: m = 2^P = 256 registers (σ ≈ 1.04/√m ≈ 6.5%). The
    * 32-bit hash leaves 24 suffix bits, so rho ∈ [1, 25]. */
  val P = 8
  val M = 1 << P // 256
  private val SuffixBits = 32 - P // 24
  private val MaxRho = SuffixBits + 1 // 25

  /** 32-bit salted md5 hash of the key — the repo's cross-engine hash
    * recipe (`('0x' || substr(md5(…),1,8))::BIGINT` on the DuckDB
    * side). */
  private def hash32(key: Column): Column =
    conv(substring(md5(concat(lit("hll_"), key.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** Map-only (bucket, rho) pair for a key — the pre-aggregation
    * projection, exposed so streaming plans can ride the same integer
    * parts under windowed state (registers are max-mergeable, so any
    * grouping/windowing of `max(rho)` is a valid sketch). */
  def bucketRho(key: Column): (Column, Column) = {
    val h = hash32(key)
    val bucket = shiftright(h, SuffixBits)
    val suffix = h.bitwiseAND(lit((1L << SuffixBits) - 1))
    // rho = position of the leftmost 1-bit in the suffix (1-based from
    // the MSB side), MaxRho when the suffix is all zeros; bit length
    // via bin() string length (bin(0) = "0" needs the special case)
    val rho = when(suffix === 0, lit(MaxRho))
      .otherwise(lit(MaxRho) - length(bin(suffix)))
    (bucket, rho)
  }

  /** Non-empty registers: one row per occupied bucket, `r` = the
    * register value max(rho). Cell-exact cross-engine. */
  def registers(df: DataFrame, keyCol: String): DataFrame = {
    val (bucket, rho) = bucketRho(col(keyCol))
    df.filter(col(keyCol).isNotNull)
      .select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").cast("int").as("r"))
  }

  /** One-row estimate: (m, n_nonempty, v_zero, s_scaled, est) where
    * `s_scaled` = Σ 2^(MaxRho−r) over ALL m registers (exact integer
    * harmonic sum — empty registers contribute 2^MaxRho) and `est`
    * applies the standard small-range correction: linear counting
    * m·ln(m/V) when raw ≤ 2.5m and V > 0, else the raw
    * bias-corrected α·m²/S. */
  def estimate(df: DataFrame, keyCol: String): DataFrame =
    estimateFromRegisters(registers(df, keyCol), Nil)

  /** The estimator over an existing register table (column `r`),
    * optionally per group — the read side for streaming windowed
    * registers (each group/window is its own sketch). */
  def estimateFromRegisters(regs: DataFrame, groupCols: Seq[String])
      : DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / M) // the m ≥ 128 constant
    val mm2Scaled = M.toDouble * M * (1L << MaxRho).toDouble
    val g = groupCols.map(col)
    regs.groupBy(g: _*)
      .agg(count(lit(1)).as("n_nonempty"),
        coalesce(sum(expr(s"shiftleft(1L, $MaxRho - r)")), lit(0L))
          .as("__s_occ"))
      .select(g ++ Seq(lit(M).as("m"), col("n_nonempty"),
        (lit(M) - col("n_nonempty")).as("v_zero"),
        (col("__s_occ") +
          (lit(M) - col("n_nonempty")) * lit(1L << MaxRho))
          .as("s_scaled")): _*)
      .withColumn("__raw",
        lit(alpha) * lit(mm2Scaled) / col("s_scaled").cast("double"))
      // full small/large-range correction set (Flajolet 2007 for a
      // 32-bit hash): linear counting below 2.5m; the collision
      // correction −2³²·ln(1 − E/2³²) above 2³²/30 (register
      // saturation makes the raw estimate drift low well before 2³²);
      // at E ≥ 2³² the 32-bit sketch is saturated outright — raise
      // loudly (shard the keyspace or move to a 64-bit-hash tier)
      .select(g ++ Seq(col("m"), col("n_nonempty"), col("v_zero"),
        col("s_scaled"),
        round(when(col("__raw") <= 2.5 * M && col("v_zero") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) /
            col("v_zero").cast("double")))
          .when(col("__raw") >= 4294967296.0, raise_error(lit(
            "Hll: raw estimate at the 32-bit hash ceiling — the " +
              "sketch is saturated; shard the keyspace or use a " +
              "wider-hash tier")))
          .when(col("__raw") > lit(4294967296.0) / 30.0,
            lit(-4294967296.0) * log(lit(1.0) -
              col("__raw") / lit(4294967296.0)))
          .otherwise(col("__raw")), 6).as("est")): _*)
  }
}
