package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the AllPairs /
  * PPJoin family (Bayardo et al. WWW'07; Xiao et al. WWW'08; Vernica et
  * al. SIGMOD'10 for the MapReduce formulation; see PAPERS.md). Finds
  * every pair of records whose token-set Jaccard similarity meets a
  * threshold, EXACTLY — the deterministic counterpart to the MinHash-LSH
  * tier ([[Dedup.nearDupPairs]]): LSH trades recall for speed; prefix
  * filtering keeps 100% recall and prunes with a theorem instead of a
  * hash.
  *
  * Prefix-filter principle: order every record's tokens by ascending
  * global document frequency (rarest first; ties broken by token text so
  * the order is total). If J(a,b) >= t, then the first
  * `|x| - ceil(t*|x|) + 1` tokens of EACH side must share at least one
  * token — so only records sharing a *prefix* token can be candidates,
  * and common tokens (stopwords) sit at the end of the ordering where
  * they are never indexed. A length filter (`t*max(n1,n2) <= min(n1,n2)`)
  * prunes further before verification.
  *
  * Scale shape (the reason this survives 100 TB):
  *  - token strings shuffle exactly twice: once keyed by token for the
  *    document-frequency count, once keyed by record id to reassemble the
  *    frequency-ordered array. Candidate generation shuffles only
  *    `(prefix token, id, set size)` — and prefix tokens are by
  *    construction the RAREST tokens of each record, so the equi-join's
  *    per-key bucket sizes are self-limiting (a token appearing in k
  *    records yields at most C(k,2) candidate pairs, and frequent tokens
  *    are excluded from prefixes).
  *  - candidate pairs are ids-only, `distinct()`-ed before verification
  *    so a pair sharing several prefix tokens verifies once.
  *  - verification joins each candidate id to its token array exactly
  *    once per side; `array_intersect` computes the exact overlap.
  *
  * Floating-point discipline: the prefix length and length filter are
  * computed with a small downward nudge on `t*n`, so FP rounding can only
  * LENGTHEN a prefix / WIDEN the filter (extra candidates, never a missed
  * pair) — correctness never rests on a boundary. The final predicate
  * `overlap/union >= t` is one IEEE division and compare, bit-identical
  * across engines.
  *
  * Contrast with the reference (a 363-LoC Kafka bridge with no joins):
  * this operator exists for the north-star corpus-dedup mandate, not for
  * reference parity.
  */
object SetSimJoin {

  private val Eps = 1e-9

  /** Caller projection materialized once behind an id exchange. Without
    * it, CollapseProject inlines the (often expensive — shingling,
    * normalization) token projection into every downstream reference —
    * and these plans reference the token sets from FIVE consumers
    * (frequency count, order reassembly, both verify sides, sizes), so
    * the caller's lineage would re-run per consumer (measured 5-8× on
    * the shingled gate). The identical exchange subtree is planned once
    * and reused (ReusedExchange) — the same exchange-reuse posture the
    * semantic-dedup plan asserts. */
  private def prepare(df: DataFrame, idCol: String,
      tokensCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
        array_distinct(col(tokensCol)).as("__tk"))
      .repartition(col("__id"))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)

  /** Reassemble each record's tokens in ascending-(df, token) order
    * under the caller-supplied GLOBAL frequency table. Keyed by __id
    * ALONE so the aggregation is satisfied by base's existing
    * hash(__id) partitioning — no second id exchange (__n rides along
    * as first()); the freq side is a partial-agg table AQE broadcasts
    * when small and shuffle-joins when vocabulary-scale. */
  private def orderByFreq(base: DataFrame, freq: DataFrame): DataFrame =
    base.select(col("__id"), col("__n"), explode(col("__tk")).as("__tok"))
      .join(freq, "__tok")
      .groupBy("__id")
      .agg(first(col("__n")).as("__n"),
        transform(
          sort_array(collect_list(struct(col("__df"), col("__tok")))),
          s => s("__tok")).as("__ord"))

  /** Prefix events: the first `|x| - ceil(t|x|) + 1` tokens of each
    * record's frequency order, with their 0-based position. The length
    * is nudged so FP error can only LENGTHEN a prefix (extra
    * candidates, never a missed pair). */
  private def prefixOf(ordered: DataFrame, t: Double): DataFrame = {
    val prefLen = (col("__n")
      - ceil(lit(t) * col("__n") - lit(Eps)).cast("int") + 1)
    ordered
      .select(col("__id"), col("__n"),
        posexplode(slice(col("__ord"), lit(1), prefLen)))
      .withColumnRenamed("pos", "__p") // 0-based position in full order
      .withColumnRenamed("col", "__tok")
  }

  /** Candidate generation: equi-join two prefix-event streams on the
    * shared token, under the length filter and the PPJoin positional
    * filter (Xiao et al. WWW'08 §3.2) — for a shared prefix token at
    * 0-based positions (p1, p2), the overlap is at most this token plus
    * whatever remains AFTER it on each side, `1 + min(n1-p1-1,
    * n2-p2-1)`, because both sides list tokens in the same global total
    * order. J >= t ⇔ overlap >= t/(1+t)·(n1+n2), so a generating event
    * whose upper bound misses that requirement cannot certify the pair.
    * Safe under `distinct()` over surviving events: a qualifying pair's
    * FIRST shared token (in global order) has zero shared tokens before
    * it, so its bound >= the true overlap >= the requirement — and the
    * prefix-filter theorem puts that first shared token inside both
    * prefixes. Both thresholds carry the downward FP nudge. */
  private def candidates(prefixA: DataFrame, prefixB: DataFrame,
      t: Double, sameSide: Boolean): DataFrame = {
    val a = prefixA.select(col("__id").as("id1"), col("__n").as("n1"),
      col("__p").as("__p1"), col("__tok").as("__tok1"))
    val b = prefixB.select(col("__id").as("id2"), col("__n").as("n2"),
      col("__p").as("__p2"), col("__tok").as("__tok2"))
    val minOverlap =
      ceil(lit(t / (1 + t)) * (col("n1") + col("n2")) - lit(Eps))
    val posBound =
      lit(1) + least(col("n1") - col("__p1"), col("n2") - col("__p2")) - 1
    val order =
      if (sameSide) col("id1") < col("id2") else lit(true)
    a.join(b,
        col("__tok1") === col("__tok2") && order &&
          least(col("n1"), col("n2")).cast("double") >=
            lit(t) * greatest(col("n1"), col("n2")) - lit(Eps) &&
          posBound.cast("double") >= minOverlap)
      .select("id1", "id2").distinct()
  }

  /** Exact verification: one token-array join per side, exact set
    * overlap, final one-division Jaccard predicate (bit-identical
    * across engines). */
  private def verify(cand: DataFrame, baseA: DataFrame, baseB: DataFrame,
      t: Double): DataFrame = {
    val s1 = baseA.select(col("__id").as("id1"), col("__tk").as("__tk1"),
      col("__n").as("n1"))
    val s2 = baseB.select(col("__id").as("id2"), col("__tk").as("__tk2"),
      col("__n").as("n2"))
    cand.join(s1, "id1").join(s2, "id2")
      .withColumn("overlap", size(array_intersect(col("__tk1"), col("__tk2"))))
      .withColumn("jaccard", col("overlap").cast("double") /
        (col("n1") + col("n2") - col("overlap")))
      .filter(col("jaccard") >= t)
      .select("id1", "id2", "n1", "n2", "overlap", "jaccard")
  }

  /** All pairs `(id1 < id2)` with `J(tokens1, tokens2) >= minJaccard`.
    *
    * @param df        input; one row per record
    * @param idCol     unique record id (orderable — pairs emit id1 < id2)
    * @param tokensCol `array<string>` token column; de-duplicated
    *                  internally (Jaccard is over SETS). Rows with empty
    *                  token sets never pair.
    * @param minJaccard threshold in (0, 1]
    * @return (id1, id2, n1, n2, overlap, jaccard), n* = distinct-token
    *         set sizes
    */
  def joinByJaccard(df: DataFrame, idCol: String, tokensCol: String,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0,1], got $minJaccard")
    val t = minJaccard
    val base = prepare(df, idCol, tokensCol)
    val freq = base.select(explode(col("__tk")).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__df"))
    val prefix = prefixOf(orderByFreq(base, freq), t)
    verify(candidates(prefix, prefix, t, sameSide = true), base, base, t)
  }

  /** Cross-corpus (R-S) set-similarity join — record LINKAGE rather than
    * self-dedup: every pair with one record from `left`, one from
    * `right`, and Jaccard >= `minJaccard`. The alignment step of
    * corpus-vs-corpus matching (re-crawl vs archive, vendor feed vs
    * master, contaminated-shard lookup) where a self-join would drown
    * the cross pairs in within-corpus near-dups.
    *
    * Same machinery, one structural change (Vernica et al. SIGMOD'10
    * §4.3): the token-frequency total order is computed over BOTH
    * corpora's bags — prefix filtering is only sound when the two sides
    * agree on the ordering — and candidate generation joins left
    * prefixes against right prefixes only (no id1 < id2 cut; sides are
    * distinct by construction).
    *
    * @return (id1 from left, id2 from right, n1, n2, overlap, jaccard)
    */
  def joinBetween(left: DataFrame, leftId: String, leftTokens: String,
      right: DataFrame, rightId: String, rightTokens: String,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0,1], got $minJaccard")
    val t = minJaccard
    val baseL = prepare(left, leftId, leftTokens)
    val baseR = prepare(right, rightId, rightTokens)
    val freq = baseL.select(explode(col("__tk")).as("__tok"))
      .unionAll(baseR.select(explode(col("__tk")).as("__tok")))
      .groupBy("__tok").agg(count(lit(1)).as("__df"))
    val prefL = prefixOf(orderByFreq(baseL, freq), t)
    val prefR = prefixOf(orderByFreq(baseR, freq), t)
    verify(candidates(prefL, prefR, t, sameSide = false),
      baseL, baseR, t)
  }

  /** Containment (R-S) join: pairs with `|A∩B| / |A| >= t` — the
    * QUOTE / near-subset direction Jaccard cannot express (a short
    * fragment fully inside a long document has tiny Jaccard but
    * containment 1.0; plagiarism/quotation detection, contaminated-
    * fragment lookup).
    *
    * Asymmetry changes the pruning math: the overlap requirement
    * `⌈t·|A|⌉` depends on A ALONE, so prefix filtering stays sound on
    * the A side (pigeonhole: with overlap ≥ o, at most o−1 shared
    * tokens fit in A's last o−1 positions, so a shared token sits
    * within A's first `|A| − ⌈t·|A|⌉ + 1` tokens — in ANY fixed token
    * order; the global rare-first order is kept purely for prefix
    * SELECTIVITY). B has no prefix bound of its own and contributes a
    * plain token explode — deliberately NOT the per-record
    * frequency-ordered reassembly, which is the expensive step and
    * whose positional bound adds nothing here (the A-side prefix
    * already implies `nA − pA ≥ ⌈t·nA⌉`). Put the small/query corpus
    * on the LEFT. The length filter (`nB ≥ ⌈t·nA⌉`) prunes with the
    * usual downward FP nudge; the final `overlap/nA ≥ t` is one IEEE
    * division.
    *
    * @return (id1 from left, id2 from right, n1, n2, overlap,
    *         containment) */
  def joinByContainment(left: DataFrame, leftId: String,
      leftTokens: String, right: DataFrame, rightId: String,
      rightTokens: String, minContainment: Double): DataFrame = {
    require(minContainment > 0 && minContainment <= 1,
      s"minContainment must be in (0,1], got $minContainment")
    val t = minContainment
    val baseL = prepare(left, leftId, leftTokens)
    val baseR = prepare(right, rightId, rightTokens)
    val freq = baseL.select(explode(col("__tk")).as("__tok"))
      .unionAll(baseR.select(explode(col("__tk")).as("__tok")))
      .groupBy("__tok").agg(count(lit(1)).as("__df"))
    val prefL = prefixOf(orderByFreq(baseL, freq), t)
    val fullR = baseR.select(col("__id"), col("__n"),
      explode(col("__tk")).as("__tok"))
    val a = prefL.select(col("__id").as("id1"), col("__n").as("n1"),
      col("__tok").as("__tok1"))
    val b = fullR.select(col("__id").as("id2"), col("__n").as("n2"),
      col("__tok").as("__tok2"))
    val minOverlap = ceil(lit(t) * col("n1") - lit(Eps))
    val cand = a.join(b,
        col("__tok1") === col("__tok2") &&
          col("n2").cast("double") >= minOverlap)
      .select("id1", "id2").distinct()
    val s1 = baseL.select(col("__id").as("id1"), col("__tk").as("__tk1"),
      col("__n").as("n1"))
    val s2 = baseR.select(col("__id").as("id2"), col("__tk").as("__tk2"),
      col("__n").as("n2"))
    cand.join(s1, "id1").join(s2, "id2")
      .withColumn("overlap",
        size(array_intersect(col("__tk1"), col("__tk2"))))
      .withColumn("containment",
        col("overlap").cast("double") / col("n1"))
      .filter(col("containment") >= t)
      .select("id1", "id2", "n1", "n2", "overlap", "containment")
  }

  /** Exact transitive near-dup dedup — the deterministic counterpart of
    * [[Dedup.minhashDedupTransitive]]: connected components over the
    * EXACT Jaccard pair graph (no LSH recall loss), every record labeled
    * with its component's minimum id as the survivor. Composes
    * [[joinByJaccard]] (ids-only pairs) with the min-label propagation
    * loop ([[Graph.connectedComponents]]); records joining no pair
    * survive as themselves.
    *
    * @return (idCol, survivor, is_dup) for EVERY input record
    */
  def dedupByJaccard(df: DataFrame, idCol: String, tokensCol: String,
      minJaccard: Double,
      componentPartitions: Option[Int] = None): DataFrame = {
    val pairs = joinByJaccard(df, idCol, tokensCol, minJaccard)
      .select("id1", "id2")
    dedupFromPairs(df, idCol, pairs, componentPartitions)
  }

  /** [[dedupByJaccard]]'s survivor labeling given an ALREADY-COMPUTED
    * pair graph — lets a caller that has materialized [[joinByJaccard]]'s
    * output (e.g. a persisted pair artifact shared across queries) run
    * component labeling without re-running shingling + prefix join.
    * `componentPartitions` clamps the propagation loop's checkpointed
    * state for fixture-scale graphs (see [[Dedup.clusterComponents]]). */
  def dedupFromPairs(df: DataFrame, idCol: String, pairs: DataFrame,
      componentPartitions: Option[Int] = None): DataFrame = {
    val comps = Graph.connectedComponents(
      pairs.select("id1", "id2"), "id1", "id2",
      numPartitions = componentPartitions)
      .withColumnRenamed("node", "__node")
    df.select(col(idCol))
      .join(comps, col(idCol) === col("__node"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("survivor"))
      .withColumn("is_dup", col("survivor") =!= col(idCol))
  }
}
