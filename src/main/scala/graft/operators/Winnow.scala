package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale shape: one explode to (doc, pos, gram-hash) rows — linear in
  * corpus bytes, the tokenize cost class — then a per-doc ROWS-frame
  * window (bounded by doc length, the per-key bounded pattern) and a
  * distinct. Nothing global; docs never compare to each other here —
  * downstream equi-joins on fp_hash find the cross-doc matches.
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
    val grams = df.filter(length(t) >= k + w - 1)
      .select(col(idCol), t.as("__t"), ng.as("__ng"),
        explode(sequence(lit(1L), ng)).as("__pos"))
      .select(col(idCol), col("__ng"), col("__pos"),
        aggregate(
          transform(split(col("__t").substr(col("__pos").cast("int"),
            lit(k)), ""), c => ascii(c).cast("long")),
          lit(0L), (acc, c) => (acc * 31 + c) % M).as("__gh"))
      // pos rides the low digits of the packed min — a ≥ 10⁶-char doc
      // would corrupt the packing silently, so refuse it loudly
      .withColumn("__pos",
        when(col("__pos") >= PosBase, raise_error(lit(
          s"Winnow.fingerprints: doc exceeds $PosBase chars — raise " +
            "PosBase or chunk upstream"))).otherwise(col("__pos")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("__sel",
        min(col("__gh") * PosBase + col("__pos")).over(win))
      .filter(col("__pos") <= col("__ng") - w + 1)
      .select(col(idCol), expr(s"__sel div $PosBase").as("fp_hash"),
        (col("__sel") % PosBase).as("fp_pos"))
      .distinct()
  }
}
