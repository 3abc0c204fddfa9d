package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier ranking metrics at corpus scale — ROC AUC and average
  * precision (PR AUC) WITHOUT a global sort: the quality-classifier /
  * filter-model evaluation half the curation loop needs (score a corpus,
  * check the ranking against a trusted label, THEN pick the threshold).
  * Complements [[Classifier.calibration]] (which checks probability
  * calibration, not ranking).
  *
  * Shape: collapse rows to the DISTINCT-score (pos, neg) count table
  * (one shuffle, same cardinality class as a groupBy), then the
  * two-phase bucket-offset running count (the [[Selection]] /
  * [[Sequence]] scheme: per-bucket totals + [[Bounded.constPart]]-marked
  * offsets over the BUCKET table, within-bucket windows bounded by
  * bucket granularity) gives each distinct score its exact
  * below-this-score cumulative — no single-task window, no global sort.
  *
  * FP discipline: AUC's numerator and denominator are EXACT longs —
  * `AUC = (2·concordant + tied) / (2·n₁·n₀)` counts pair outcomes, the
  * tie-corrected rank-sum (Mann–Whitney) identity — so the output is ONE
  * IEEE division of exact integers, shipped raw (the hash-gate rule).
  * Average precision is an inherently order-summed quantity
  * (Σ ΔR·P over thresholds), so it ships rounded 6dp.
  */
object Eval {

  /** Exact tie-corrected ROC AUC.
    *
    * @param bucket monotone non-decreasing coarsening of the score
    *               order (e.g. `v => floor(v * 100)`) — bucket skew
    *               bounds per-task window size, exactly as in
    *               [[Selection.exactQuantiles]]
    * @return one row: (n_pos, n_neg, concordant, tied, auc); raises
    *         loudly when either class is absent (AUC undefined) */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
      bucket: Column => Column): DataFrame = {
    val cum = cumBelow(df, scoreCol, labelCol, bucket)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    cum.agg(
        sum("__p").as("n_pos"), sum("__q").as("n_neg"),
        sum(col("__p") * col("__negBelow")).as("concordant"),
        sum(col("__p") * col("__q")).as("tied"))
      // guard rides the 1-row global aggregate (AQE-prune-safe; the
      // Drift.ks lesson) — a single-class input has no defined AUC.
      // The pair-count space is n₁·n₀: past 2^63 pairs the long SUMS
      // above (and the 2·n₁·n₀ denominator) wrap silently, so that
      // bound raises loudly; below it the division runs over DECIMAL
      // reassembly, exact at every in-range magnitude (round-11 fix)
      .select(col("n_pos"), col("n_neg"), col("concordant"), col("tied"),
        when(col("n_pos") === 0 || col("n_neg") === 0 ||
            col("n_pos").isNull || col("n_neg").isNull,
          raise_error(lit("rocAuc: need both classes present")))
          .when(col("n_pos").cast(dec) * col("n_neg").cast(dec) >
              lit(Long.MaxValue).cast(dec) / 2,
            raise_error(lit("rocAuc: n_pos*n_neg beyond 2^62 pairs — " +
              "the exact pair counts overflow; sample or shard")))
          .otherwise((lit(2L).cast(dec) * col("concordant").cast(dec) +
            col("tied").cast(dec)).cast("double") /
            (lit(2L).cast(dec) * col("n_pos").cast(dec) *
              col("n_neg").cast(dec)).cast("double"))
          .as("auc"))
  }

  /** Average precision (area under the precision–recall curve, step
    * interpolation over distinct score thresholds descending):
    * `AP = Σ_s (p(s)/n₁) · P(s)` with `P(s) = TP(s) / (TP(s)+FP(s))`
    * over all rows scoring ≥ s. Every TP/FP is an exact long off the
    * same cumulative table as [[rocAuc]]; the per-threshold division
    * chain makes the SUM order-dependent, so `ap` ships rounded 6dp.
    *
    * @return one row: (n_pos, n_neg, ap) */
  def avgPrecision(df: DataFrame, scoreCol: String, labelCol: String,
      bucket: Column => Column): DataFrame = {
    val cum = cumBelow(df, scoreCol, labelCol, bucket)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val tot = cum.agg(sum("__p").as("__n1"), sum("__q").as("__n0"))
    cum.crossJoin(broadcast(tot))
      .select(col("__p"), col("__n1"), col("__n0"),
        // rows scoring >= s: totals minus the strictly-below cums
        (col("__n1") - col("__posBelow")).as("__tp"),
        (col("__n1") + col("__n0") - col("__posBelow") -
          col("__negBelow")).as("__atk"))
      // the per-threshold divisor n₁·n(≥s) is a long×long product (up
      // to n²) that wraps past ~3e9 rows — multiply in DECIMAL and
      // divide as one double, exact for in-range values (round-11 fix)
      .agg(max(col("__n1")).as("n_pos"), max(col("__n0")).as("n_neg"),
        sum(col("__p").cast("double") * col("__tp") /
          (col("__n1").cast(dec) * col("__atk").cast(dec))
            .cast("double")).as("__ap"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_pos").isNull,
          raise_error(lit("avgPrecision: no positive rows")))
          .otherwise(round(col("__ap"), 6)).as("ap"))
  }

  /** Multiclass confusion statistics — per-class TP/FP/FN plus
    * precision / recall / F1 — the hard-decision companion to the
    * ranking metrics above (a lang-id or quality-filter model ships a
    * LABEL; this is how its per-class behavior is audited at corpus
    * scale).
    *
    * Shape: ONE shuffle to the (actual, predicted) pair-count table
    * (cardinality = |classes|², never rows), then per-class actual and
    * predicted totals are two tiny aggregates OVER THAT TABLE, joined
    * back by class — the corpus is scanned exactly once.
    *
    * Classes are the UNION of actual and predicted labels, so a class
    * the model never emits (recall 0) and a class it hallucinates
    * (precision 0) both get a row. FP discipline: tp/fp/fn are exact
    * longs; precision/recall/f1 are fixed IEEE chains over them with
    * the sklearn zero-division convention (0.0 when the denominator is
    * 0) — raw-hashable, no summation order anywhere.
    *
    * @return one row per class: (class, tp, fp, fn, precision, recall,
    *         f1), class ascending not enforced (callers sort) */
  def confusionStats(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val pairs = df
      .filter(col(actualCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(actualCol).as("__a"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
    val actTot = pairs.groupBy(col("__a").as("__cls"))
      .agg(sum("__n").as("__na"))
    val predTot = pairs.groupBy(col("__p").as("__cls2"))
      .agg(sum("__n").as("__np"))
    val diag = pairs.filter(col("__a") === col("__p"))
      .select(col("__a").as("__cls3"), col("__n").as("__tp"))
    val base = actTot.join(predTot, col("__cls") <=> col("__cls2"), "full")
      .select(coalesce(col("__cls"), col("__cls2")).as("cls"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__np"), lit(0L)).as("__np"))
      .join(diag, col("cls") <=> col("__cls3"), "left")
      .select(col("cls"), coalesce(col("__tp"), lit(0L)).as("tp"),
        col("__np"), col("__na"))
    val p = when(col("__np") === 0, lit(0.0))
      .otherwise(col("tp").cast("double") / col("__np"))
    val r = when(col("__na") === 0, lit(0.0))
      .otherwise(col("tp").cast("double") / col("__na"))
    base.select(col("cls"), col("tp"),
        (col("__np") - col("tp")).as("fp"),
        (col("__na") - col("tp")).as("fn"),
        p.as("precision"), r.as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
  }

  /** ROUGE-N between paired candidate/reference texts — the n-gram
    * overlap metric of summarization/generation eval, at corpus scale:
    * `recall = Σ_g min(c_cand(g), c_ref(g)) / Σ_g c_ref(g)` (clipped
    * counts, the standard definition), precision symmetric, F1 their
    * harmonic mean.
    *
    * Shape: both sides explode to (pair, gram, side counts) and meet
    * in ONE (pair, gram) partial-agg shuffle; clipping is a map-only
    * `least` over the merged row, and the per-pair reduction is a
    * second partial agg — no joins, no windows, text never shuffles
    * (grams hash-partition).
    *
    * Tokenization is the repo's whitespace-lowercase recipe (empty
    * tokens dropped); a side with fewer than n tokens has zero
    * n-grams. FP: counts exact longs; P/R/F1 fixed IEEE chains with
    * the zero-denominator→0 convention (a pair with an empty reference
    * scores 0, visible via ref_ngrams = 0).
    *
    * @return one row per pair id: (idCol, cand_ngrams, ref_ngrams,
    *         overlap, precision, recall, f1) */
  /** Cohen's kappa — chance-corrected agreement between two
    * categorical labelings (annotator agreement, model-vs-model
    * consistency): `κ = (p_o − p_e) / (1 − p_e)` with `p_o` the
    * observed agreement and `p_e = Σ_c rowTot_c·colTot_c / n²` the
    * chance agreement. Same single-shuffle pair-table shape as
    * [[confusionStats]] (|classes|² rows, corpus scanned once); all
    * counts and the Σ row·col term are exact integers (DECIMAL(38,0)
    * products), κ a fixed IEEE chain over them, shipped raw. Total
    * chance agreement (`p_e = 1` — both sides constant on one class)
    * makes κ 0/0 and raises loudly.
    *
    * @return one row: (n, agree, po, pe, kappa) */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pairs = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val aTot = pairs.groupBy(col("__a").as("__cls"))
      .agg(sum("__n").as("__na"))
    val bTot = pairs.groupBy(col("__b").as("__cls2"))
      .agg(sum("__n").as("__nb"))
    val cross = aTot.join(bTot, col("__cls") <=> col("__cls2"), "full")
      .agg(coalesce(sum(coalesce(col("__na"), lit(0L)).cast(dec) *
        coalesce(col("__nb"), lit(0L)).cast(dec)), lit(0L).cast(dec))
        .as("__sumRC"))
    val base = pairs.agg(
      coalesce(sum("__n"), lit(0L)).as("n"),
      coalesce(sum(when(col("__a") <=> col("__b"), col("__n"))
        .otherwise(0L)), lit(0L)).as("agree"))
    base.crossJoin(cross)
      .select(
        when(col("n") === 0, raise_error(lit(
          "Eval.cohenKappa: no jointly labeled rows")))
          .otherwise(col("n")).as("n"),
        col("agree"), col("__sumRC"))
      .withColumn("po", col("agree").cast("double") / col("n"))
      .withColumn("pe", col("__sumRC").cast("double") /
        (col("n").cast(dec) * col("n").cast(dec)).cast("double"))
      .select(col("n"), col("agree"), col("po"), col("pe"),
        when(col("pe") === 1.0, raise_error(lit(
          "Eval.cohenKappa: total chance agreement (pe = 1) — kappa " +
            "is undefined; both labelings are a single identical class")))
          .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .as("kappa"))
  }

  /** Fleiss' κ — chance-corrected agreement for N raters per item (the
    * multi-rater generalization of [[cohenKappa]]): the "do our three
    * labeling models agree beyond chance" audit a multi-annotator
    * curation pipeline needs before trusting majority votes.
    *
    * `κ = (P̄ − P̄ₑ)/(1 − P̄ₑ)` with `P̄ = (Σᵢ Σ_c n_ic² − N·r) /
    * (N·r·(r−1))` and `P̄ₑ = Σ_c (Σᵢ n_ic)² / (N·r)²` — every sum an
    * exact DECIMAL(38,0) integer off the (item, category) count table,
    * the final value one fixed IEEE chain over them
    * (`κ = (A·D² − B·C) / (B·(D² − C))`).
    *
    * Preconditions raised loudly: every item must carry exactly the
    * same number of ratings `r ≥ 2` (Fleiss assumes a balanced design;
    * a silently-unbalanced table corrupts both P̄ terms), and a
    * duplicate (item, rater) pair raises rather than double-counting.
    *
    * Shape: one shuffle to (item, category) counts; the per-item and
    * per-category marginals are tiny aggregates over that table.
    *
    * @return one row: (n_items, n_raters, kappa) */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
      catCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = df.filter(col(itemCol).isNotNull &&
      col(raterCol).isNotNull && col(catCol).isNotNull)
    // duplicate (item, rater) would double-count a rating — the raise
    // rides the REFERENCED n_items when-chain below (a guard on an
    // unreferenced crossJoined column gets column-pruned away)
    val perRater = rows.groupBy(col(itemCol).as("__i"),
        col(raterCol).as("__rt"))
      .agg(count(lit(1)).as("__k"))
      .agg(coalesce(max("__k"), lit(0L)).as("__maxk"))
    val cells = rows.groupBy(col(itemCol).as("__i"), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
    val items = cells.groupBy(col("__i"))
      .agg(sum("__n").as("__r"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__sq"))
    val base = items.agg(
      count(lit(1)).as("n_items"),
      coalesce(min("__r"), lit(0L)).as("__rmin"),
      coalesce(max("__r"), lit(0L)).as("__rmax"),
      coalesce(sum("__sq"), lit(0).cast(dec)).as("__sumsq"))
    val catTot = cells.groupBy(col("__c"))
      .agg(sum("__n").as("__tc"))
      .agg(coalesce(sum(col("__tc").cast(dec) * col("__tc").cast(dec)),
        lit(0).cast(dec)).as("__sumcat"))
    val g = base.crossJoin(catTot).crossJoin(perRater)
      .select(
        when(col("n_items") === 0, raise_error(lit(
          "Eval.fleissKappa: no ratings")))
          .when(col("__maxk") > 1, raise_error(lit(
            "Eval.fleissKappa: duplicate (item, rater) rating")))
          .when(col("__rmin") =!= col("__rmax"), raise_error(concat(
            lit("Eval.fleissKappa: unbalanced design — items carry "),
            col("__rmin"), lit(" to "), col("__rmax"),
            lit(" ratings; Fleiss needs a constant rater count"))))
          .when(col("__rmin") < 2, raise_error(lit(
            "Eval.fleissKappa: need at least 2 ratings per item")))
          .otherwise(col("n_items")).as("n_items"),
        col("__rmin").as("n_raters"), col("__sumsq"), col("__sumcat"))
    val nD = col("n_items").cast(dec)
    val rD = col("n_raters").cast(dec)
    val a = col("__sumsq") - nD * rD // Σn² − N·r
    val b = nD * rD * (rD - 1) // N·r·(r−1)
    val d2 = nD * rD * nD * rD // (N·r)²
    g.select(col("n_items"), col("n_raters"),
      when(d2 === col("__sumcat"), raise_error(lit(
        "Eval.fleissKappa: every rating is one category (pe = 1) — " +
          "kappa is undefined")))
        .otherwise(round((a * d2 - b * col("__sumcat")).cast("double") /
          (b * (d2 - col("__sumcat"))).cast("double"), 9))
        .as("kappa"))
  }

  /** Krippendorff's α (nominal) — the agreement coefficient the
    * annotation pipeline needs when the design is UNBALANCED: raters
    * skip items, items carry different rating counts ([[cohenKappa]]
    * needs exactly 2 fixed raters, [[fleissKappa]] a constant count).
    * `α = 1 − D_o/D_e` over the coincidence matrix; items with a
    * single rating DROP (they carry no within-item pair) and are
    * reported via n_items vs the input.
    *
    * Exactness at scale: the within-item off-diagonal coincidence mass
    * `m_u² − Σ_c v_uc²` is an exact integer per item and AGGREGATES BY
    * RATING COUNT m — so D_o's only divisions are one `/(m−1)` per
    * DISTINCT m, folded in sorted-m order (bounded by `maxDistinctM`,
    * a guard on OUTPUT semantics firing post-fold — the collapsed
    * rating-count-class table is distinct-m-sized, far below data
    * scale, so pre-materialization memory is not the hazard here;
    * raised loudly). Coincidence marginals collapse to plain value
    * counts (`n_c = Σ_u v_uc`), so D_e is exact DECIMAL. α is a fixed
    * IEEE chain over those, rounded 9dp (the kappa tier).
    *
    * @return one row: (n, n_items, n_categories, alpha) — n the total
    *         ratings on contributing (≥2-rating) items */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
      raterCol: String, catCol: String,
      maxDistinctM: Int = 10000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = df.filter(col(itemCol).isNotNull &&
      col(raterCol).isNotNull && col(catCol).isNotNull)
    val perRater = rows.groupBy(col(itemCol).as("__i"),
        col(raterCol).as("__rt"))
      .agg(count(lit(1)).as("__k"))
      .agg(coalesce(max("__k"), lit(0L)).as("__maxk"))
    val cells = rows.groupBy(col(itemCol).as("__i"), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
    val items = cells.groupBy(col("__i"))
      .agg(sum("__n").as("__m"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__sq"))
      .filter(col("__m") >= 2)
    // off-diagonal coincidence mass per rating-count class, exact ints
    val perM = items.groupBy(col("__m"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col("__m").cast(dec) * col("__m").cast(dec) - col("__sq"))
          .as("__off"))
    val folded = perM.agg(
      count(lit(1)).as("__nm"),
      coalesce(sum(col("__cnt")), lit(0L)).as("n_items"),
      coalesce(sum(col("__m").cast(dec) * col("__cnt").cast(dec)),
        lit(0L).cast(dec)).as("__n"),
      sort_array(collect_list(struct(col("__m"),
        (col("__off").cast("double") /
          (col("__m") - 1).cast("double")).as("__t")))).as("__terms"))
    // marginals over CONTRIBUTING items only: re-join cells to them
    val nc = cells.join(items.select(col("__i").as("__i2")),
        col("__i") === col("__i2"))
      .groupBy(col("__c")).agg(sum("__n").as("__nc"))
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum(col("__nc").cast(dec) * col("__nc").cast(dec)),
          lit(0L).cast(dec)).as("__sumnc2"))
    val g = folded.crossJoin(nc).crossJoin(perRater).select(
      when(col("n_items") === 0, raise_error(lit(
        "Eval.krippendorffAlpha: no item carries 2+ ratings")))
        .when(col("__maxk") > 1, raise_error(lit(
          "Eval.krippendorffAlpha: duplicate (item, rater) rating")))
        .when(col("__nm") > maxDistinctM, raise_error(concat(lit(
          s"Eval.krippendorffAlpha: more than $maxDistinctM distinct " +
            "rating counts (the fold collects one term per count) — " +
            "got "), col("__nm").cast("string"))))
        .otherwise(col("__n")).as("__n"),
      col("n_items"), col("n_categories"), col("__terms"),
      col("__sumnc2"))
    val nD = col("__n")
    val dOff = aggregate(transform(col("__terms"),
      x => x.getField("__t")), lit(0.0), (acc, x) => acc + x)
    val eOff = (nD * nD - col("__sumnc2")).cast("double")
    g.select(col("__n").cast("long").as("n"), col("n_items"),
      col("n_categories"),
      when(eOff <= 0.0, raise_error(lit(
        "Eval.krippendorffAlpha: every rating is one category — " +
          "expected disagreement is 0, alpha is undefined")))
        .otherwise(round(lit(1.0) -
          (nD - 1).cast("double") * dOff / eOff, 9)).as("alpha"))
  }

  /** Multiclass Matthews correlation (Gorodkin's R_K) — the single
    * chance-corrected number for a k-class confusion table that, unlike
    * macro-F1, punishes marginal-distribution gaming:
    * `R_K = (c·s − Σ_k p_k·t_k) / (sqrt(s² − Σp_k²)·sqrt(s² − Σt_k²))`
    * with c the trace, s the total, p/t the predicted/actual marginals.
    *
    * Shape: the [[confusionStats]] pair table (one (actual, predicted)
    * shuffle, |classes|²-bounded thereafter); marginals and the trace
    * are tiny aggregates over it. Every sum is an exact DECIMAL(38,0);
    * R_K is one fixed IEEE chain (sqrt is IEEE-exact) shipped RAW.
    *
    * Loud degenerates: an empty table, or a zero denominator term
    * (every prediction one class, or every actual one class — R_K is
    * 0/0 there).
    *
    * @return one row: (n, trace, mcc) */
  def mccMulticlass(df: DataFrame, actualCol: String, predCol: String)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pairs = df
      .filter(col(actualCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(actualCol).cast("string").as("__a"),
        col(predCol).cast("string").as("__p"))
      .agg(count(lit(1)).as("__n"))
    val actTot = pairs.groupBy(col("__a").as("__cls"))
      .agg(sum("__n").as("__ta"))
    val predTot = pairs.groupBy(col("__p").as("__cls2"))
      .agg(sum("__n").as("__tp"))
    val marg = actTot
      .join(predTot, col("__cls") <=> col("__cls2"), "full")
      .select(coalesce(col("__ta"), lit(0L)).as("__ta"),
        coalesce(col("__tp"), lit(0L)).as("__tp"))
      .agg(
        coalesce(sum(col("__tp").cast(dec) * col("__ta").cast(dec)),
          lit(0L).cast(dec)).as("__pt"),
        coalesce(sum(col("__tp").cast(dec) * col("__tp").cast(dec)),
          lit(0L).cast(dec)).as("__pp"),
        coalesce(sum(col("__ta").cast(dec) * col("__ta").cast(dec)),
          lit(0L).cast(dec)).as("__tt"))
    val tot = pairs.agg(
      coalesce(sum("__n"), lit(0L)).as("n"),
      coalesce(sum(when(col("__a") === col("__p"), col("__n"))
        .otherwise(lit(0L))), lit(0L)).as("trace"))
    val g = tot.crossJoin(marg)
    val s = col("n").cast(dec)
    val num = col("trace").cast(dec) * s - col("__pt")
    val d1 = s * s - col("__pp")
    val d2 = s * s - col("__tt")
    g.select(
      when(col("n") === 0, raise_error(lit(
        "Eval.mccMulticlass: empty confusion table")))
        .otherwise(col("n")).as("n"),
      col("trace"),
      when(d1 <= 0 || d2 <= 0, raise_error(lit(
        "Eval.mccMulticlass: degenerate marginals (one class holds " +
          "every prediction or every label) — R_K is 0/0")))
        .otherwise(num.cast("double") /
          (sqrt(d1.cast("double")) * sqrt(d2.cast("double"))))
        .as("mcc"))
  }

  /** McNemar's test (continuity-corrected) — "is model B actually
    * better than model A on the SAME examples": the paired-binary
    * comparison that a naive two-proportion z gets wrong because the
    * two error rates share every row. Only the DISCORDANT counts
    * matter: `b` = A right / B wrong, `c` = A wrong / B right,
    * `χ² = (|b−c|−1)² / (b+c)`.
    *
    * Shape: ONE conditional partial-agg scan — four exact longs out.
    * Exactness: `(|b−c|−1)²` is an exact integer, so χ² is ONE raw
    * division of exact longs (rounding a terminating rational is the
    * boundary hazard — NOTES taxonomy). `b = c` yields the
    * conventional continuity-corrected 1/(b+c). Rows where either
    * flag is NULL drop; `b + c = 0` (the models never disagree)
    * raises — χ² is 0/0 and no test is possible.
    *
    * @param aCorrectCol BOOLEAN "model A was right on this row"
    * @return one row: (n, n_both_right, b, c, chi2) */
  def mcnemar(df: DataFrame, aCorrectCol: String, bCorrectCol: String)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val a = col(aCorrectCol).cast("boolean")
    val b = col(bCorrectCol).cast("boolean")
    val m = df.filter(a.isNotNull && b.isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(a && b, 1L).otherwise(0L)), lit(0L))
          .as("n_both_right"),
        coalesce(sum(when(a && !b, 1L).otherwise(0L)), lit(0L)).as("b"),
        coalesce(sum(when(!a && b, 1L).otherwise(0L)), lit(0L)).as("c"))
    val diff = abs(col("b") - col("c")) - lit(1L)
    m.select(col("n"), col("n_both_right"), col("b"),
      when(col("b") + col("c") === 0, raise_error(lit(
        "Eval.mcnemar: the models never disagree (b + c = 0) — chi2 " +
          "is 0/0")))
        .otherwise(col("c")).as("c"),
      ((diff.cast(dec) * diff.cast(dec)).cast("double") /
        (col("b") + col("c")).cast("double")).as("chi2"))
  }

  /** Cochran's Q — the k-TREATMENT generalization of [[mcnemar]]:
    * "do these k binary judges/classifiers flag the SAME items at the
    * same rate", the screen an eval platform runs over k model
    * variants before pairwise McNemars (and the binary-outcome twin
    * of [[graft.operators.Drift.friedman]]).
    * `Q = (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²)` with C_j the
    * per-treatment success totals, R_i the per-item success totals,
    * T the grand total; Q ~ χ²(k−1) under H₀.
    *
    * Distributed shape: TWO partial-agg scans of the cell table — one
    * grouped by item (R_i, then one fold row of ΣR_i/ΣR_i²; item
    * count unbounded), one grouped by treatment (k bounded rows) —
    * plus the balanced-design audit on the same grouped passes. No
    * join of data rows, no window, no collect.
    *
    * Exactness: every aggregate is an exact integer (DECIMAL(38,0)
    * past long range); numerator and denominator are exact-integer
    * chains, Q is ONE raw division of their correctly-rounded double
    * casts (pure rational — NOTES taxonomy).
    *
    * Loud degenerates: a null success cell (a present-but-unknown
    * cell breaks the paired design — drop the ROW upstream if that is
    * intended), a duplicate (item, treatment) cell, an item missing a
    * treatment (both break the complete-block contract and would
    * silently bias Q), fewer than 2 treatments, more than
    * `maxTreatments`, and zero within-item variation (every item all-
    * success or all-failure — Q is 0/0).
    *
    * @param successCol boolean-ish "this treatment succeeded on this
    *                   item"
    * @return one row: (b, k, q) — b informative-design item count */
  def cochranQ(df: DataFrame, itemCol: String, treatmentCol: String,
      successCol: String, maxTreatments: Int = 1000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val s0 = col(successCol).cast("boolean")
    val cells = df
      .filter(col(itemCol).isNotNull && col(treatmentCol).isNotNull)
      .groupBy(col(itemCol).cast("string").as("__i"),
        col(treatmentCol).cast("string").as("__t"))
      .agg(count(lit(1)).as("__dup"),
        sum(when(s0.isNull, raise_error(lit(
            "Eval.cochranQ: null success cell — a present-but-unknown " +
              "cell breaks the paired design"))
            .cast("long"))
          .when(s0, 1L).otherwise(0L)).as("__s"))
      .withColumn("__s",
        when(col("__dup") > 1L, raise_error(concat(
          lit("Eval.cochranQ: duplicate (item, treatment) cell for "),
          col("__i"), lit(" / "), col("__t"))))
          .otherwise(col("__s")))
    val perT = cells.groupBy(col("__t"))
      .agg(count(lit(1)).as("__bt"), sum("__s").as("__c"))
    val tAgg = perT.agg(
      count(lit(1)).as("k"),
      min("__bt").as("__bmin"), max("__bt").as("__bmax"),
      coalesce(sum(col("__c").cast(dec)), lit(0L).cast(dec)).as("__tot"),
      coalesce(sum(col("__c").cast(dec) * col("__c").cast(dec)),
        lit(0L).cast(dec)).as("__c2"))
    val perI = cells.groupBy(col("__i"))
      .agg(count(lit(1)).as("__ki"), sum("__s").as("__r"))
    val iAgg = perI.agg(
      count(lit(1)).as("b"),
      min("__ki").as("__kmin"), max("__ki").as("__kmax"),
      coalesce(sum(col("__r").cast(dec) * col("__r").cast(dec)),
        lit(0L).cast(dec)).as("__r2"))
    val g = iAgg.crossJoin(tAgg)
    val kChecked = when(col("k") < 2, raise_error(lit(
        "Eval.cochranQ: need at least 2 treatments")))
      .when(col("k") > maxTreatments, raise_error(concat(
        lit(s"Eval.cochranQ: more than $maxTreatments treatments — got "),
        col("k").cast("string"))))
      .when(col("__kmin") =!= col("k") || col("__kmax") =!= col("k") ||
        col("__bmin") =!= col("b") || col("__bmax") =!= col("b"),
        raise_error(lit(
          "Eval.cochranQ: incomplete design — every item needs exactly " +
            "one cell per treatment")))
      .otherwise(col("k"))
    // kD derives from kChecked (not the raw k) so the design-validation
    // raises ride the `q` expression itself — a consumer that selects
    // just `q` must not let Catalyst prune the guards (the
    // anovaF/leveneBF precedent)
    val kD = kChecked.cast(dec)
    val num = (kD - lit(1).cast(dec)) *
      (kD * col("__c2") - col("__tot") * col("__tot"))
    val den = kD * col("__tot") - col("__r2")
    g.select(col("b"), kChecked.as("k"),
      when(den <= 0, raise_error(lit(
        "Eval.cochranQ: no within-item variation (every item all-" +
          "success or all-failure) — Q is 0/0")))
        .otherwise(num.cast("double") / den.cast("double")).as("q"))
  }

  private def tokArr(c: Column): Column =
    filter(split(lower(coalesce(c, lit(""))), "\\s+"), t => t =!= "")

  /** Shared pair-eval head for [[rougeN]]/[[bleu]]: tokenize both
    * sides, then a materialization barrier — a token array referenced
    * inside the gram-building lambda would re-evaluate the full split
    * per element (the HOF-lambda tax / CollapseProject no-CSE class —
    * this exact shape measured 8.5 s → ~1 s at sf0.1); past the
    * exchange the lambdas read a materialized attribute. A duplicate
    * pair id raises loudly (pooled counts would silently corrupt every
    * score — multi-reference eval needs distinct pair rows); the guard
    * window rides the repartition exchange, costing no extra shuffle. */
  private def pairToks(df: DataFrame, idCol: String, candCol: String,
      refCol: String, op: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
    df.select(col(idCol), tokArr(col(candCol)).as("__ct"),
        tokArr(col(refCol)).as("__rt"))
      .repartition(col(idCol))
      .withColumn("__ct",
        when(count(lit(1)).over(w) > 1, raise_error(concat(
          lit(s"Eval.$op: duplicate pair id "), col(idCol).cast("string"),
          lit(" — scores would pool across rows; make ids unique"))))
          .otherwise(col("__ct")))
  }

  private def gramsOf(a: Column, n: Int): Column =
    when(size(a) >= n,
      transform(sequence(lit(0), size(a) - n),
        i => concat_ws(" ", slice(a, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  def rougeN(df: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val toks = pairToks(df, idCol, candCol, refCol, "rougeN")
    val exploded = toks.select(col(idCol), explode_outer(
        concat(transform(gramsOf(col("__ct"), n),
          g => struct(g.as("g"), lit(1L).as("c"), lit(0L).as("r"))),
          transform(gramsOf(col("__rt"), n),
            g => struct(g.as("g"), lit(0L).as("c"), lit(1L).as("r")))))
        .as("__e"))
    val perGram = exploded
      .groupBy(col(idCol), col("__e.g").as("__g"))
      .agg(sum(coalesce(col("__e.c"), lit(0L))).as("__cc"),
        sum(coalesce(col("__e.r"), lit(0L))).as("__cr"))
    val perPair = perGram.groupBy(col(idCol))
      .agg(sum("__cc").as("cand_ngrams"), sum("__cr").as("ref_ngrams"),
        sum(least(col("__cc"), col("__cr"))).as("overlap"))
    val p = when(col("cand_ngrams") === 0, lit(0.0))
      .otherwise(col("overlap").cast("double") / col("cand_ngrams"))
    val r = when(col("ref_ngrams") === 0, lit(0.0))
      .otherwise(col("overlap").cast("double") / col("ref_ngrams"))
    perPair.select(col(idCol), col("cand_ngrams"), col("ref_ngrams"),
        col("overlap"), p.as("precision"), r.as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
  }

  /** Sentence-level BLEU (Papineni et al. 2002, unsmoothed) between
    * paired candidate/reference texts — [[rougeN]]'s precision-side
    * sibling: clipped modified n-gram precisions p₁..p_maxN, brevity
    * penalty `min(1, e^(1−ref/cand))`, geometric mean
    * `BP·exp(Σ ln pₙ / N)`.
    *
    * Shape (r14, closing the r13 verdict #7 profiling pass): BLEU is
    * strictly PER-PAIR, so the whole statistic computes in ONE
    * map-only kernel call per row ([[graft.functions
    * .TextHashExpressions.bleuStatsOf]] — fused tokenize + clipped
    * overlap per order, gram identity a 64-bit hash fold, no gram
    * string ever materialized). The old tagged-explode form paid an
    * 8-stream explode + a (pair, n, gram)-keyed shuffle (~8 shuffle
    * rows per token); the only exchange left is the id-keyed
    * duplicate-pair guard carrying (id, 2·maxN+1 longs). Measured
    * 2.63 → 1.01 s at sf0.1 (isolated best-of-two).
    *
    * FP: counts and precisions exact-int divisions (pₙ ship raw);
    * `bleu` crosses exp/ln (libm) so it rounds 6dp. Unsmoothed zero
    * rule: any pₙ = 0 (or an empty candidate) ⇒ bleu = 0 — visible
    * via the raw pₙ columns.
    *
    * @return one row per pair: (idCol, cand_len, ref_len, p_1..p_maxN,
    *         bp, bleu) */
  def bleu(df: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8]: $maxN")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // one kernel call per row BEFORE the exchange, so only (id, stats)
    // longs shuffle; the window guard rides that exchange (the pairToks
    // precedent: a duplicate pair id would silently pool counts)
    val w = Window.partitionBy(col(idCol))
    val stats = df.select(col(idCol),
        graft.functions.GraftFunctions.bleuStats(
          coalesce(col(candCol), lit("")),
          coalesce(col(refCol), lit("")), maxN).as("__st"))
      .repartition(col(idCol))
      .withColumn("__st",
        when(count(lit(1)).over(w) > 1, raise_error(lit(
          s"Eval.bleu: duplicate pair id in '$idCol' — pooled n-gram " +
            "counts would silently corrupt every score; one row per " +
            "(candidate, reference) pair")))
          .otherwise(col("__st")))
    def candN(k: Int) = element_at(col("__st"), k)
    def ov(k: Int) = element_at(col("__st"), maxN + k)
    val pivoted = stats.select(col(idCol) +:
      candN(1).as("cand_len") +:
      element_at(col("__st"), 2 * maxN + 1).as("ref_len") +:
      (1 to maxN).map(k =>
        when(candN(k) === 0, lit(0.0))
          .otherwise(ov(k).cast("double") / candN(k)).as(s"p_$k")): _*)
    val bp = when(col("cand_len") === 0, lit(0.0))
      .when(col("cand_len") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("ref_len").cast("double") / col("cand_len")))
    val anyZero = (1 to maxN).map(k => col(s"p_$k") === 0.0)
      .reduce(_ || _)
    val lnSum = (1 to maxN).map(k => log(col(s"p_$k")))
      .reduce(_ + _)
    // bp and bleu both cross exp/ln (libm differs by an ulp across
    // engines — caught live on bp) → 6dp; bleu multiplies the RAW bp
    // so the rounding doesn't compound
    pivoted
      .withColumn("bleu",
        when(col("cand_len") === 0 || anyZero, lit(0.0))
          .otherwise(round(bp * exp(lnSum / maxN.toDouble), 6)))
      .withColumn("bp", round(bp, 6))
      .select(col(idCol) +: col("cand_len") +: col("ref_len") +:
        (1 to maxN).map(k => col(s"p_$k")) :+ col("bp") :+
        col("bleu"): _*)
  }

  /** Distinct-score (pos, neg) counts plus exact strictly-below
    * cumulatives for both classes — the shared two-phase running count
    * (bucket offsets + within-bucket prefix windows). */
  private def cumBelow(df: DataFrame, scoreCol: String, labelCol: String,
      bucket: Column => Column): DataFrame = {
    val lab = col(labelCol).cast("boolean")
    val g = df.filter(col(scoreCol).isNotNull && lab.isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(sum(when(lab, 1L).otherwise(0L)).as("__p"),
        sum(when(lab, 0L).otherwise(1L)).as("__q"))
      .withColumn("__bk", bucket(col("__s")))
    val offs = g.groupBy("__bk")
      .agg(sum("__p").as("__pb"), sum("__q").as("__qb"))
    offsJoin(g, offs)
  }

  // split so the aggregate aliases above stay readable
  private def offsJoin(g: DataFrame, offsRaw: DataFrame): DataFrame = {
    val wOff = Window.partitionBy(Bounded.constPart(col("__pb")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = offsRaw
      .withColumn("__offP", coalesce(sum(col("__pb")).over(wOff), lit(0L)))
      .withColumn("__offQ", coalesce(sum(col("__qb")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__offP"), col("__offQ"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .withColumn("__posBelow",
        col("__offP") + coalesce(sum(col("__p")).over(wIn), lit(0L)))
      .withColumn("__negBelow",
        col("__offQ") + coalesce(sum(col("__q")).over(wIn), lit(0L)))
  }

  /** Mantel–Haenszel pooled odds ratio + test over stratified 2×2
    * tables — the confounder-adjusted effect estimate an A/B readout
    * needs when a stratifier (cohort, region, device) is imbalanced
    * across arms: per stratum h with cells a (exposed, positive),
    * b (exposed, negative), c (unexposed, positive), d (unexposed,
    * negative) and n = a+b+c+d,
    * `OR_MH = Σ a·d/n ÷ Σ b·c/n` and the MH chi-square (1 df, no
    * continuity correction)
    * `χ² = (Σa − Σ(a+b)(a+c)/n)² / Σ (a+b)(c+d)(a+c)(b+d)/(n²(n−1))`.
    *
    * Distributed shape: ONE groupBy to the per-stratum 2×2 cells
    * (cardinality = strata), then one global aggregate — the corpus
    * is scanned once; null stratum/arm/outcome rows are filtered.
    *
    * FP: the per-stratum terms are exact-integer products over n (not
    * integers themselves), so their sums ride doubles and `or_mh` /
    * `chi2` ship ROUNDED 6dp (the llr/zipf transcendental tier);
    * Σa and the stratum count are exact.
    *
    * Loud degenerates: fewer than 2 strata (use a plain 2×2 test), a
    * stratum with n < 2 (the variance divides by n−1), Σb·c/n = 0
    * (OR_MH infinite), zero pooled variance (χ² is 0/0).
    *
    * @return one row: (k, n, sum_a, or_mh, chi2) */
  def mantelHaenszel(df: DataFrame, stratumCol: String, armCol: String,
      outcomeCol: String, maxStrata: Int = 1000): DataFrame = {
    val cells = df
      .filter(col(stratumCol).isNotNull && col(armCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .groupBy(col(stratumCol).as("__h"))
      .agg(
        sum(when(col(armCol).cast("boolean") &&
          col(outcomeCol).cast("boolean"), 1L).otherwise(0L)).as("__a"),
        sum(when(col(armCol).cast("boolean") &&
          !col(outcomeCol).cast("boolean"), 1L).otherwise(0L)).as("__b"),
        sum(when(!col(armCol).cast("boolean") &&
          col(outcomeCol).cast("boolean"), 1L).otherwise(0L)).as("__c"),
        sum(when(!col(armCol).cast("boolean") &&
          !col(outcomeCol).cast("boolean"), 1L).otherwise(0L)).as("__d"))
    val n = col("__a") + col("__b") + col("__c") + col("__d")
    val nD = n.cast("double")
    val g = cells.select(col("__a"), col("__b"), col("__c"), col("__d"),
        when(n < 2, raise_error(lit(
          "Eval.mantelHaenszel: stratum with fewer than 2 rows — the " +
            "MH variance divides by n-1; merge or drop the stratum " +
            "explicitly")))
          .otherwise(n).as("__n"))
      .agg(count(lit(1)).as("k"), sum(col("__n")).as("n"),
        sum("__a").as("sum_a"),
        sum(col("__a").cast("double") * col("__d") / nD).as("__ad"),
        sum(col("__b").cast("double") * col("__c") / nD).as("__bc"),
        sum((col("__a") + col("__b")).cast("double") *
          (col("__a") + col("__c")) / nD).as("__e"),
        sum((col("__a") + col("__b")).cast("double") *
          (col("__c") + col("__d")) * (col("__a") + col("__c")) *
          (col("__b") + col("__d")) /
          (nD * nD * (nD - lit(1.0)))).as("__v"))
    g.select(col("k"), col("n"), col("sum_a"),
      when(col("k") < 2, raise_error(lit(
        "Eval.mantelHaenszel: need at least 2 strata — use a plain " +
          "2x2 test")))
        .when(col("__bc") === 0.0, raise_error(lit(
          "Eval.mantelHaenszel: no discordant (unexposed-positive x " +
            "exposed-negative) mass — OR_MH is infinite")))
        .otherwise(round(col("__ad") / col("__bc"), 6)).as("or_mh"),
      when(col("__v") === 0.0, raise_error(lit(
        "Eval.mantelHaenszel: zero pooled variance — every stratum " +
          "margin is degenerate")))
        .otherwise(round(
          (col("sum_a") - col("__e")) * (col("sum_a") - col("__e")) /
            col("__v"), 6)).as("chi2"))
  }

  /** Cronbach's alpha — internal-consistency reliability of a k-item
    * instrument (the agreement family's SCALE member: [[fleissKappa]]
    * / [[krippendorffAlpha]] score categorical raters; this scores
    * whether k numeric items measure one construct — k quality
    * sub-scores, k prompt-variants of a judge):
    * `α = k/(k−1) · (1 − Σ_j σ²_j / σ²_total)` over population
    * variances of each item and of the per-subject totals.
    *
    * Exactness: with a COMPLETE design (every subject scores every
    * item — anything else raises, the [[cochranQ]] convention) and
    * integer values (ENFORCED: a fractional score like 3.7 raises
    * instead of silently truncating in the long cast), both variance
    * sums clear to the common
    * `n²` denominator, so
    * `Σσ²_j / σ²_tot = Σ_j (n·Σx²_j − (Σx_j)²) / (n·ΣT² − (ΣT)²)`
    * is ONE division of exact DECIMAL(38,0) sums and alpha ships RAW.
    *
    * Distributed shape: one groupBy per item (k cells), one per
    * subject (n cells), two tiny aggregates — no windows, no joins
    * beyond the 1-row combine.
    *
    * @return one row: (n_subjects, k_items, alpha) */
  def cronbachAlpha(df: DataFrame, subjectCol: String, itemCol: String,
      valueCol: String, maxItems: Int = 1000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = col(valueCol).cast("long")
    val base = df.select(col(subjectCol).as("__s"), col(itemCol).as("__i"),
      when(col(subjectCol).isNull || col(itemCol).isNull ||
        col(valueCol).isNull, raise_error(lit(
        "Eval.cronbachAlpha: null subject/item/value cell — an " +
          "absent score would silently shrink an item's variance")))
        .when(col(valueCol).cast("double") =!= v.cast("double"),
          raise_error(lit(
            "Eval.cronbachAlpha: non-integer score — the long cast " +
              "would silently truncate it (3.7 -> 3) and corrupt the " +
              "exact variance sums; pre-scale to integers first")))
        .otherwise(v).as("__v"))
    // per-item moments + the complete-design check rides the k-cell
    // table: every item must see exactly the same subject count
    val perItem = base.groupBy(col("__i"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__v").cast(dec)).as("__sx"),
        sum(col("__v").cast(dec) * col("__v").cast(dec)).as("__sxx"),
        countDistinct(col("__s")).as("__ns"))
    val perSubj = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__ki"), sum(col("__v").cast(dec)).as("__t"))
    val subjAgg = perSubj.agg(
      count(lit(1)).as("__n_subj"),
      min("__ki").as("__kmin"), max("__ki").as("__kmax"),
      sum(col("__t")).as("__st"),
      sum(col("__t") * col("__t")).as("__stt"))
    val itemAgg = perItem.agg(
      count(lit(1)).as("__k"),
      min("__n").as("__nmin"), max("__n").as("__nmax"),
      min("__ns").as("__nsmin"),
      sum(col("__n").cast(dec) * col("__sxx") - col("__sx") * col("__sx"))
        .as("__sumVarNum"))
    val g = itemAgg.crossJoin(subjAgg)
    val kD = col("__k").cast("double")
    val totVarNum = col("__n_subj").cast(dec) * col("__stt") -
      col("__st") * col("__st")
    g.select(col("__n_subj").as("n_subjects"), col("__k").as("k_items"),
      when(col("__k") < 2, raise_error(lit(
        "Eval.cronbachAlpha: need at least 2 items")))
        .when(col("__k") > maxItems, raise_error(concat(lit(
          s"Eval.cronbachAlpha: more than $maxItems items — got "),
          col("__k").cast("string"))))
        .when(col("__kmin") =!= col("__k") || col("__kmax") =!= col("__k") ||
          col("__nmin") =!= col("__n_subj") ||
          col("__nmax") =!= col("__n_subj") ||
          col("__nsmin") =!= col("__n_subj"),
          raise_error(lit(
            "Eval.cronbachAlpha: incomplete design — every subject " +
              "needs exactly one score per item")))
        .when(totVarNum === 0, raise_error(lit(
          "Eval.cronbachAlpha: zero total-score variance — alpha is " +
            "0/0 (every subject has the same total)")))
        .otherwise(kD / (kD - lit(1.0)) *
          (lit(1.0) - col("__sumVarNum").cast("double") /
            totVarNum.cast("double")))
        .as("alpha"))
  }
}
