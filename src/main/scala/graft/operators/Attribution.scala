package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution over an event log — which channels OPEN
  * journeys (first touch), which CLOSE them (last touch), and which
  * assist in between, for every conversion with ≥ 1 qualifying touch
  * inside the lookback window.
  *
  * Shape at scale: one user-keyed equi-join (conversions ⋈ touches)
  * with the time-window residual — shuffles carry (user, ts, id,
  * channel) only — then per-conversion windows partitioned by the
  * CONVERSION id (bounded by touches-per-conversion, never by a user's
  * lifetime history). All outputs are exact integers: position-based
  * counts instead of fractional linear credit, because a Σ(1/n) of
  * doubles is summation-order-sensitive and would violate the repo's
  * bit-identical gate discipline (the exact-rational credit variant is
  * the documented extension).
  *
  * Determinism: simultaneous touches tie-break on the event id, so
  * first/last are total-order stable in any engine.
  */
object Attribution {

  /** @param conversionType event type that ends a journey
    * @param touchTypes     channel event types eligible for credit
    * @param lookbackDays   window: touch in [conv - lookback, conv)
    * @return one row per channel present in ≥ 1 window:
    *         (channel, first_touch, last_touch, assists, conversions)
    *         — assists counts EVERY touch, including first/last
    */
  def positionCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, conversionType: String,
      touchTypes: Seq[String], lookbackDays: Int): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(lookbackDays >= 1, s"lookbackDays must be >= 1: $lookbackDays")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("__u"), col(idCol).as("__conv_id"),
        col(tsCol).as("__conv_ts"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("channel"),
        col(idCol).as("__touch_id"), col(tsCol).as("__touch_ts"))
    val pairs = conv.join(touch, Seq("__u"))
      .filter(col("__touch_ts") < col("__conv_ts") &&
        col("__touch_ts") >= col("__conv_ts") -
          expr(s"INTERVAL $lookbackDays DAYS"))
    val byConv = Window.partitionBy(col("__conv_id"))
    val asc = byConv.orderBy(col("__touch_ts").asc, col("__touch_id").asc)
    val desc = byConv.orderBy(col("__touch_ts").desc, col("__touch_id").desc)
    pairs
      .withColumn("__rn_first", row_number().over(asc))
      .withColumn("__rn_last", row_number().over(desc))
      .groupBy(col("channel"))
      .agg(
        sum(when(col("__rn_first") === 1, 1L).otherwise(0L))
          .as("first_touch"),
        sum(when(col("__rn_last") === 1, 1L).otherwise(0L))
          .as("last_touch"),
        count(lit(1)).as("assists"),
        countDistinct(col("__conv_id")).as("conversions"))
  }
}
