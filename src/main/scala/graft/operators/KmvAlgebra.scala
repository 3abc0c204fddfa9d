package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Set algebra over KMV sketches ([[graft.functions.KmvSketchAgg]]):
  * union / intersection / Jaccard cardinality estimates from the tiny
  * sorted hash arrays alone — the pre-aggregated-audience pattern
  * (sketch each segment once; answer every pairwise overlap question
  * without rescanning raw data).
  *
  * Estimators (Beyer et al., SIGMOD'07):
  *   - merged sketch `M` = the k smallest distinct hashes of A ∪ B —
  *     itself a valid KMV sketch of the union;
  *   - `D̂(S)` = exact |S| while the sketch holds fewer than k hashes
  *     (every hash seen is retained), else `(k−1)/frac(kth min)`;
  *   - Jaccard `ρ̂` = |M ∩ A ∩ B| / |M|;
  *   - `D̂∩` = ρ̂ · D̂∪ (rounded to a count).
  * In the sub-k regime every formula is EXACT by construction — the
  * gate regime — and all arithmetic is fixed-order IEEE over integer
  * hash values, so results hash across engines.
  *
  * Everything here is built-in array expressions over ≤ k-element
  * arrays: codegen'd, no UDF, no shuffle beyond whatever join carries
  * the sketch rows (segment tables are tiny by definition).
  */
object KmvAlgebra {

  private val span =
    Long.MaxValue.toDouble - Long.MinValue.toDouble

  /** Merged (union) sketch: k smallest distinct hashes of both. */
  def merge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Cardinality estimate of the set a sketch summarizes — exact
    * below k (mirrors `KmvDistinct.eval` bit-for-bit). */
  def estimate(sk: Column, k: Int): Column = {
    val kth = element_at(sk, k).cast("double")
    val frac = (kth - lit(Long.MinValue.toDouble)) / lit(span)
    when(size(sk) < k, size(sk).cast("long"))
      .when(frac <= 0d, size(sk).cast("long"))
      .otherwise(round(lit((k - 1).toDouble) / frac).cast("long"))
  }

  /** |A ∪ B| estimate from two sketches. */
  def unionEstimate(a: Column, b: Column, k: Int): Column =
    estimate(merge(a, b, k), k)

  /** Jaccard estimate ρ̂ = |M ∩ A ∩ B| / |M| (0 for two empty sets). */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val m = merge(a, b, k)
    when(size(m) === 0, lit(0d))
      .otherwise(size(array_intersect(m, array_intersect(a, b)))
        .cast("double") / size(m))
  }

  /** |A ∩ B| estimate: ρ̂ · D̂∪, rounded to a count. */
  def intersectEstimate(a: Column, b: Column, k: Int): Column =
    round(jaccardEstimate(a, b, k) *
      unionEstimate(a, b, k).cast("double")).cast("long")
}
