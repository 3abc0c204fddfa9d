package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent aggregation of money-like doubles.
  *
  * The test tables store prices/balances/rates as DOUBLE with exactly two
  * decimal places. `round(sum(<double>), 6)` is summation-order-sensitive
  * once the sum's magnitude exhausts a double's ~15-16 significant digits:
  * at 1e8+ the 6th decimal place is the 15th+ significant digit, so Spark's
  * partial-agg grouping vs DuckDB's scan order can land either side of a
  * rounding boundary — the r4 `q_bucketed_join` red row (every mktsegment
  * sum × 1e6 sat exactly on a .5 boundary).
  *
  * Summing in DECIMAL is exact and therefore commutative; casting the exact
  * result back to DOUBLE is deterministic (IEEE round-to-nearest) and
  * engine-agnostic, so Spark and DuckDB produce bit-identical doubles
  * regardless of partial-agg order, bucketing, or scan order. The SQL-side
  * twins of these combinators live in the oracle strings, e.g.
  * `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  */
object Exact {

  /** 2-dp money column type: exact for cents, headroom to 1e16. */
  val Money: DecimalType = DecimalType(18, 2)

  /** 2-dp rate column type (discount / tax in [0, 1)). */
  val Rate: DecimalType = DecimalType(4, 2)

  /** Exact, order-independent sum of a 2-dp money column, as DOUBLE. */
  def sumMoney(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact mean of a 2-dp money column: exact decimal numerator, then one
    * double division — identical in any engine that sums decimals exactly. */
  def avgMoney(c: Column): Column =
    sum(c.cast(Money)).cast(DoubleType) / count(c)

  /** `l_extendedprice * (1 - l_discount)` in exact decimal:
    * dec(12,2) × dec(5,2) → dec(18,4); no precision-loss path in Spark
    * (max p 18+5+1=24 < 38) or DuckDB (width 12+5=17 < 38). */
  def discPrice: Column =
    col("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(Rate))

  /** `discPrice * (1 + l_tax)`: dec(18,4) × dec(5,2) → dec(24,6), exact
    * (a product of three 2-dp values has at most 6 decimal places). */
  def charge: Column =
    discPrice * (lit(1).cast(DecimalType(3, 2)) + col("l_tax").cast(Rate))

  /** Sum an already-exact decimal expression (e.g. [[discPrice]]) and
    * surface it as DOUBLE. */
  def sumExact(c: Column): Column = sum(c).cast(DoubleType)
}
