package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential event-pattern matching (MATCH_RECOGNIZE-lite): count the
  * greedy non-overlapping occurrences of an event-type SUBSEQUENCE per
  * key, optionally requiring consecutive matched steps to fall within a
  * maximum time gap — the product-analytics shape between [[Sessionize]]
  * (time-gap grouping) and the funnel (first-occurrence ordering): "how
  * many times did this user complete signup → click → purchase, with no
  * step more than an hour after the previous one?"
  *
  * Why not window functions: the matcher's state (current step + last
  * matched time) is a sequential recurrence no frame expresses. The
  * operator uses the [[TimeSeries.emaFeatures]] shape instead —
  * `groupBy(key) → sort_array(collect_list(struct(ts, id, type))) → one
  * in-row `aggregate` fold` — ONE exchange at any scale, with per-key
  * state bounded by that key's own event list (the documented per-key
  * contract of the EMA/sessionize family). The greedy scan is
  * deterministic on the (ts, id) total order, and its arithmetic is
  * integer-µs only, so the DuckDB oracle replays the identical fold and
  * the gate hashes exactly.
  */
object Patterns {

  /** @param pattern event-type sequence to match as a subsequence
    *                (greedy, non-overlapping, restart after completion)
    * @param maxGapUs max µs between CONSECUTIVE matched steps (None =
    *                 unbounded); a too-late step candidate is simply not
    *                 consumed (the matcher keeps waiting — a later
    *                 occurrence may still satisfy the gap)
    * @param maxEventsPerKey hot-key guard: a key whose history exceeds
    *                 this many events fails LOUDLY in-plan (the
    *                 maxBroadcastProbes discipline) instead of
    *                 materializing a giant row and OOMing an executor;
    *                 route such keys to the streaming form
    *                 ([[graft.streaming.StreamOps]] stateful transform)
    *                 or pre-window the log
    * @return (key, n_matches, last_match_ts) per key, n_matches ≥ 0;
    *         last_match_ts = completion time of the final match (null
    *         when none)
    *
    * Greedy-matcher caveat: by default the scan never re-anchors
    * mid-pattern — a partial match in progress "holds" its earlier
    * steps, so a fresh pattern-start occurring while step k > 0 is
    * pending is not considered as an alternative anchor. With a tight
    * `maxGapUs`, a completion that a restart at the later anchor would
    * have found can be missed (n_matches is the greedy count, not the
    * maximum subsequence-packing count). This is the documented
    * MATCH_RECOGNIZE `AFTER MATCH SKIP PAST LAST ROW`-style semantics;
    * the oracle replays the identical greedy fold.
    *
    * `reAnchor = true` closes the common restart case: the fold also
    * remembers the LATEST unconsumed pattern-start seen while
    * mid-pattern, and when a step-1 candidate fails the gap against
    * the stale primary anchor but fits the remembered one, the match
    * restarts there (the remembered anchor is consumed; it clears on
    * every completion, so match spans stay non-overlapping). One
    * remembered anchor catches the gap-broken-at-step-1 restarts —
    * the ADVICE scenario — without the full per-anchor NFA, which at
    * unbounded key histories belongs to the streaming stateful form.
    */
  def matchSequence(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, pattern: Seq[String],
      maxGapUs: Option[Long] = None, reAnchor: Boolean = false,
      maxEventsPerKey: Int = 1 << 20): DataFrame = {
    require(pattern.nonEmpty, "empty pattern")
    val n = pattern.length
    // pattern as an array literal; step i must equal pattern(i)
    val patLit = array(pattern.map(lit): _*)
    val sorted = events
      .select(col(keyCol), struct(unix_micros(col(tsCol)).as("ts"),
        col(idCol).as("id"), col(typeCol).as("t")).as("__e"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("__e"))).as("__es"))
      .withColumn("__es", when(size(col("__es")) > maxEventsPerKey,
        raise_error(concat(
          lit("matchSequence: key "), col(keyCol).cast("string"),
          lit(s" exceeds $maxEventsPerKey events in one in-row fold; " +
            "raise maxEventsPerKey, pre-window the log, or route hot " +
            "keys to the streaming stateful form"))))
        .otherwise(col("__es")))
    // fold state: (step, matches, last_ts, done_ts, alt_anchor_ts)
    val init: Column = struct(lit(0).as("step"), lit(0L).as("m"),
      lit(null).cast("bigint").as("last"),
      lit(null).cast("bigint").as("done"),
      lit(null).cast("bigint").as("alt"))
    def stepFn(acc: Column, e: Column): Column = {
      val want = element_at(patLit, acc.getField("step") + 1)
      val gapOk = maxGapUs match {
        case None => lit(true)
        case Some(g) => acc.getField("step") === 0 ||
          (e.getField("ts") - acc.getField("last")) <= g
      }
      val takes = e.getField("t") === want && gapOk
      val nextStep = acc.getField("step") + 1
      // re-anchor: a step-1 candidate the primary can't take (stale
      // gap) restarts from the remembered later anchor when it fits
      val reTakes =
        if (!reAnchor || n < 2 || maxGapUs.isEmpty) lit(false)
        else !takes && acc.getField("step") === 1 &&
          e.getField("t") === pattern(1) &&
          acc.getField("alt").isNotNull &&
          (e.getField("ts") - acc.getField("alt")) <= maxGapUs.get
      // latest unconsumed pattern-start while mid-pattern
      val remembers =
        if (!reAnchor) lit(false)
        else acc.getField("step") > 0 && e.getField("t") === pattern.head
      when(takes && nextStep === n,
        struct(lit(0).as("step"), (acc.getField("m") + 1L).as("m"),
          lit(null).cast("bigint").as("last"),
          e.getField("ts").as("done"),
          lit(null).cast("bigint").as("alt")))
        .when(takes,
          struct(nextStep.as("step"), acc.getField("m").as("m"),
            e.getField("ts").as("last"), acc.getField("done").as("done"),
            acc.getField("alt").as("alt")))
        .when(reTakes && lit(n) === 2,
          struct(lit(0).as("step"), (acc.getField("m") + 1L).as("m"),
            lit(null).cast("bigint").as("last"),
            e.getField("ts").as("done"),
            lit(null).cast("bigint").as("alt")))
        .when(reTakes,
          struct(lit(2).as("step"), acc.getField("m").as("m"),
            e.getField("ts").as("last"), acc.getField("done").as("done"),
            lit(null).cast("bigint").as("alt")))
        .when(remembers,
          struct(acc.getField("step").as("step"),
            acc.getField("m").as("m"), acc.getField("last").as("last"),
            acc.getField("done").as("done"),
            e.getField("ts").as("alt")))
        .otherwise(acc)
    }
    sorted.select(col(keyCol),
        aggregate(col("__es"), init, stepFn).as("__st"))
      .select(col(keyCol),
        col("__st").getField("m").as("n_matches"),
        timestamp_micros(col("__st").getField("done")).as("last_match_ts"))
  }
}
