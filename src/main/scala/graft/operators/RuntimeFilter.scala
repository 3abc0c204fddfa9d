package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Runtime semi-join reduction: build a Bloom filter over the SMALL join
  * side's keys and drop non-candidate rows from the LARGE side MAP-ONLY,
  * before the join's shuffle — the "runtime filter" / "sideways
  * information passing" optimization warehouses apply when a selective
  * dimension filter should prune the fact scan.
  *
  * Why it matters at 100 TB: a fact⋈dim join where the dim filter keeps
  * 1% of keys still shuffles ALL fact rows under a plain shuffle join.
  * With the filter, the fact side sheds ~99% of its rows inside the scan
  * stage (the Bloom probe is a codegen'd expression,
  * [[graft.functions.BloomContains]]) and only candidates reach the
  * exchange. The m-bit filter rides ONE broadcast row — no collect, no
  * driver materialization; the build is a partial-aggregating job over
  * the small side's keys only.
  *
  * Correctness: Bloom false positives pass extra rows, which the join
  * itself then drops — the filter is RESULT-INVISIBLE. That argument
  * only holds for join types that discard unmatched large-side rows, so
  * the operator accepts `inner` and `left_semi` (for `left_anti`/outer
  * joins the pre-filter would change results and is rejected loudly).
  */
object RuntimeFilter {

  /** Equi join `large ⋈ small` on `key`, with the large side Bloom-pruned
    * before the shuffle.
    *
    * @param mBits filter size in bits (default 1M bits = 128 KiB
    *              broadcast; size at ~10 bits/key for ~1% FP)
    * @param k     hash probes per key
    */
  def bloomFilteredJoin(large: DataFrame, small: DataFrame, key: String,
      mBits: Int = 1 << 20, k: Int = 5,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi").contains(joinType),
      s"the Bloom pre-filter is only result-invisible for joins that " +
        s"drop unmatched large-side rows; '$joinType' is not")
    val filt = small.agg(
      GraftFunctions.bloomAgg(col(key), mBits, k).as("__bloom"))
    val pruned = large.crossJoin(broadcast(filt))
      .filter(GraftFunctions.bloomContains(col("__bloom"), col(key),
        mBits, k))
      .drop("__bloom")
    pruned.join(small, Seq(key), joinType)
  }
}
