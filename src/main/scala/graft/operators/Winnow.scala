package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
  * SIGMOD'03 — the MOSS local-fingerprinting algorithm): hash every
  * k-gram, slide a window of `w` consecutive k-gram hashes, and keep
  * each window's minimum — guaranteeing any match of length
  * ≥ k + w − 1 shares a fingerprint, at an expected density of
  * 2/(w+1). The plagiarism / near-copy detection primitive whose
  * selected-position evidence exact dedup (which needs identical
  * docs) and MinHash (which loses positions) both lack.
  *
  * Determinism / oracle: the k-gram hash is the repo's shared
  * polynomial `(h·31 + c) mod 1e9+7` (the q_text_rollhash recipe,
  * reproducible in SQL), and the window minimum is taken over the
  * single long `hash·10⁶ + pos` — a lexicographic (hash, pos) min, so
  * ties select the LEFTMOST minimal position (the original algorithm's
  * "robust winnowing" picks the rightmost; any fixed rule preserves
  * the guarantee — ours is chosen to be one comparison in both
  * engines). Requires positions < 10⁶, loudly guarded.
  *
  * Scale shape (round 11, the per-doc ARRAY kernel): the whole
  * selection is doc-LOCAL, so nothing ever leaves its document row
  * until the final explode of SELECTED fingerprints (expected density
  * 2/(w+1) of positions). The char-code array is computed once per doc,
  * gram hashes and window minima are array ops over it — no
  * per-position `substr`/`split` (the measured "HOF-lambda tax": the
  * round-10 form re-sliced and re-split the text once per exploded
  * position and then shuffled every position into a window, 6.3 s at
  * sf0.1 vs sub-second here). The two `repartition(id)` exchanges are
  * materialization barriers (CollapseProject has no CSE: an array
  * referenced inside a downstream HOF lambda re-evaluates its producing
  * expression per element — the NOTES.md barrier idiom), each moving
  * one array row per doc — linear in corpus bytes. Docs never compare
  * to each other here; downstream equi-joins on fp_hash find the
  * cross-doc matches.
  */
object Winnow {

  private val M = 1000000007L
  private val PosBase = 1000000L

  /** @return (idCol, fp_hash, fp_pos) — the selected fingerprints;
    *         docs shorter than k + w − 1 chars have no full window and
    *         emit nothing (mirrored by the oracle's length filter) */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val t = col(textCol)
    val ng = (length(t) - k + 1).cast("long")
    // pos rides the low digits of the packed min — a ≥ 10⁶-char doc
    // would corrupt the packing silently, so refuse it loudly
    val codes = df.filter(length(t) >= k + w - 1)
      .select(col(idCol),
        when(ng >= PosBase, raise_error(lit(
          s"Winnow.fingerprints: doc exceeds $PosBase chars — raise " +
            "PosBase or chunk upstream"))).otherwise(ng).as("__ng"),
        transform(split(t, ""), c => ascii(c).cast("long")).as("__codes"))
      .repartition(col(idCol)) // barrier: codes materialize ONCE per doc
    // packed (hash, pos) per gram position: hash·10⁶ + pos, so one
    // long min is the lexicographic (hash, pos) min — leftmost tie
    val packed = codes
      .select(col(idCol), col("__ng"),
        transform(sequence(lit(1L), col("__ng")), p =>
          aggregate(slice(col("__codes"), p.cast("int"), lit(k)),
            lit(0L), (acc, c) => (acc * 31 + c) % M) * PosBase + p)
          .as("__pk"))
      .repartition(col(idCol)) // barrier: __pk feeds w window minima each
    packed
      .select(col(idCol),
        explode(array_distinct(
          transform(sequence(lit(1L), col("__ng") - w + 1), p =>
            array_min(slice(col("__pk"), p.cast("int"), lit(w))))))
          .as("__sel"))
      .select(col(idCol), expr(s"__sel div $PosBase").as("fp_hash"),
        (col("__sel") % PosBase).as("fp_pos"))
  }
}
