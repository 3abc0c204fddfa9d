package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: per-query precision@k / recall@k /
  * MRR@k / nDCG@k of a ranked run against graded relevance judgments —
  * the eval loop that closes the BM25/ANN retrieval tier
  * ([[TextSearch]], [[AnnSearch]], [[IvfPq]]).
  *
  * Scale shape: the run prunes to rank ≤ k at the scan; judgments join
  * by (query, doc) — the only shuffles carry (query, doc, rank, grade)
  * tuples. Per-query state is the ≤ k-element (rank, grade) array, so
  * group buffers are bounded regardless of corpus size, and metric
  * folds run IN RANK ORDER inside the row (the
  * [[TimeSeries.emaFeatures]] determinism argument: a fixed-order fold
  * is reproducible across partitionings and engines).
  *
  * Numeric contract: counts are exact; precision/recall/MRR are single
  * integer-ratio IEEE divisions shipped RAW (bit-identical
  * cross-engine); DCG/nDCG involve log2 (transcendental) and are
  * rounded to 6 dp (boundary-free per the repo's rounding taxonomy).
  */
object Retrieval {

  /** @param run    ranked results: (queryCol, docCol, rankCol); ranks are
    *               1-based and unique within a query
    * @param qrels  judgments: (queryCol, docCol, gradeCol); grade > 0 =
    *               relevant, graded grades feed DCG
    * @param k      evaluation cutoff
    * @return one row per query present in `run`:
    *         (query, n_rel, rel_ret, precision_at_k, recall_at_k,
    *          mrr_at_k, ndcg_at_k)
    */
  def evaluate(run: DataFrame, qrels: DataFrame, queryCol: String,
      docCol: String, rankCol: String, gradeCol: String,
      k: Int): DataFrame = {
    require(k > 0, "cutoff k must be positive")
    val q = col(queryCol)
    val topk = run.select(q, col(docCol), col(rankCol).cast("long")
        .as("__rank"))
      .filter(col("__rank") <= k)
    val judged = qrels.select(q, col(docCol),
      col(gradeCol).cast("long").as("__grade"))
    // per-query relevant totals (for recall) + ideal DCG from the TOP-k
    // grades sorted descending: position within equal grades is
    // interchangeable (the term depends only on grade and position)
    val byQuery = judged.filter(col("__grade") > 0)
      .groupBy(q).agg(
        count(lit(1)).as("n_rel"),
        slice(sort_array(collect_list(col("__grade")), asc = false),
          1, k).as("__top_grades"))
      .withColumn("__idcg",
        aggregate(
          zip_with(col("__top_grades"),
            sequence(lit(1), size(col("__top_grades"))),
            (g, i) => g.cast("double") / log2(i.cast("double") + 1d)),
          lit(0d), (acc, x) => acc + x))
    val hits = topk.join(judged, Seq(queryCol, docCol), "left")
      .withColumn("__grade", coalesce(col("__grade"), lit(0L)))
    val perQuery = hits.groupBy(q).agg(
      sort_array(collect_list(struct(col("__rank").as("r"),
        col("__grade").as("g")))).as("__rg"))
    val scored = perQuery
      .withColumn("rel_ret",
        size(filter(col("__rg"), x => x.getField("g") > 0)).cast("long"))
      .withColumn("__first_rel",
        array_min(transform(filter(col("__rg"), x => x.getField("g") > 0),
          x => x.getField("r"))))
      .withColumn("__dcg",
        aggregate(col("__rg"), lit(0d), (acc, x) =>
          acc + x.getField("g").cast("double") /
            log2(x.getField("r").cast("double") + 1d)))
    // anchor on run's distinct queries: a query whose results ALL fall
    // past rank k must surface with zero metrics, not vanish (its
    // absence reads as "not evaluated" instead of "retrieved nothing
    // useful") — the @return contract is one row per query in `run`
    run.select(q).distinct()
      .join(scored, Seq(queryCol), "left")
      .join(byQuery, Seq(queryCol), "left")
      .select(q,
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("rel_ret"), lit(0L)).as("rel_ret"),
        (coalesce(col("rel_ret"), lit(0L)).cast("double") / k)
          .as("precision_at_k"),
        when(col("n_rel") > 0,
          coalesce(col("rel_ret"), lit(0L)).cast("double") / col("n_rel"))
          .as("recall_at_k"),
        coalesce(lit(1d) / col("__first_rel"), lit(0d)).as("mrr_at_k"),
        when(col("n_rel") > 0,
          round(coalesce(col("__dcg"), lit(0d)) / col("__idcg"), 6))
          .as("ndcg_at_k"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
    * combine N ranked runs by `RRF(d) = Σ_runs 1/(kc + rank_run(d))` —
    * the standard zero-training hybrid-retrieval combiner (lexical
    * BM25 + dense ANN is THE production pairing), robust because
    * only ranks matter, never incomparable scores.
    *
    * Scale shape: each run is already a per-query top-k (bounded);
    * fusion is one union + one groupBy on the doc key and a top-k —
    * nothing here scales with the corpus, only with k·runs.
    *
    * Determinism: ranks are exact integers, each 1/(kc+rank) term is
    * one IEEE division; with two runs the sum is order-free (IEEE
    * addition is commutative), beyond that it is order-summed — either
    * way `rrf` ships rounded 6dp with the doc key as tie-break.
    *
    * @param runs ranked runs, each (docCol, rankCol) with 1-based
    *             unique ranks; a doc absent from a run contributes
    *             nothing for it
    * @return top-`topK` rows (docCol, n_runs, rrf) */
  def rrfFuse(runs: Seq[DataFrame], docCol: String, rankCol: String,
      kc: Int = 60, topK: Int = 10): DataFrame = {
    require(runs.nonEmpty, "need at least one run")
    require(kc >= 1, s"kc must be >= 1, got $kc")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tagged = runs.zipWithIndex.map { case (r, i) =>
      r.select(col(docCol), col(rankCol).cast("long").as("__r"),
        lit(i).as("__run"))
    }
    // a doc listed twice within ONE run would inflate n_runs and sum
    // extra 1/(kc+rank) terms silently — raise loudly instead (the
    // Eval.pairToks duplicate-id idiom; round-11 ADVICE fix). The
    // raise rides the rrf column itself — the top-k SORT KEY — so
    // TakeOrderedAndProject must evaluate it for EVERY input row
    // before the heap cut; anchored on the projected n_runs it fired
    // only for retained rows (round-12 ADVICE fix). Past the guard
    // count(*) == countDistinct(run), so neither column changes.
    tagged.reduce(_ unionAll _)
      .groupBy(docCol)
      .agg(count(lit(1)).as("__n_rows"),
        countDistinct(col("__run")).as("__n_distinct"),
        sum(lit(1.0) / (lit(kc) + col("__r"))).as("__rrf_raw"))
      .select(col(docCol),
        col("__n_distinct").as("n_runs"),
        when(col("__n_rows") =!= col("__n_distinct"),
          raise_error(concat(
            lit("Retrieval.rrfFuse: doc appears more than once within " +
              "a single run: "), col(docCol).cast("string"))))
          .otherwise(round(col("__rrf_raw"), 6)).as("rrf"))
      .orderBy(col("rrf").desc, col(docCol))
      .limit(topK)
  }
}
