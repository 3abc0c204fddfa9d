package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the classic
  * trainable tier of corpus curation (fastText-style language/quality
  * identification): where [[Classifier]] runs INFERENCE over fixed
  * hashed weights, this TRAINS per-class token log-probabilities from a
  * labeled corpus and classifies with them. Everything is counting:
  * training is two partial-agg shuffles over (label, token) and
  * (label) — embarrassingly parallel at 100 TB — and scoring is a
  * token-keyed broadcast join + per-(doc, class) sum.
  *
  * Model: add-one (Laplace) smoothing over the GLOBAL vocabulary V:
  * `log P(t|c) = ln((tf_{t,c} + 1) / (N_c + V))`; unseen tokens take the
  * tf = 0 form computed per class at score time. Priors are document
  * frequencies. Log-probs are one IEEE division + one `ln` of exact
  * integer counts; scores sum ~doc-length of them, so the gate rounds
  * 6dp (the surprisal precedent — absorbs partial-agg summation-order
  * last-ulp drift).
  *
  * Tokenization matches the repo's cross-engine recipe exactly:
  * `split(lower(text), "\s+")`, empty tokens dropped.
  */
object NaiveBayes {

  private def tokens(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).as("__doc"),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")

  /** Train: one row per (class, token) SEEN in that class:
    * (label, tok, tf, log_prob). Class-level stats ride every row is
    * wasteful — they live in [[classStats]] instead. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val t = tokens(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("__doc"),
        col(labelCol).as("label")), "__doc")
    val tf = t.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val nl = t.groupBy(col("label")).agg(count(lit(1)).as("__nl"))
    val v = t.agg(countDistinct(col("tok")).as("__v"))
    tf.join(nl, "label").crossJoin(broadcast(v))
      .select(col("label"), col("tok"), col("tf"),
        log((col("tf") + lit(1L)).cast("double") /
          (col("__nl") + col("__v")).cast("double")).as("log_prob"))
  }

  /** Per-class stats the classifier needs alongside [[train]]'s rows:
    * (label, n_docs, n_tokens, log_prior, log_unseen). */
  def classStats(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val t = tokens(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("__doc"),
        col(labelCol).as("label")), "__doc")
    val nl = t.groupBy(col("label")).agg(count(lit(1)).as("n_tokens"))
    val v = t.agg(countDistinct(col("tok")).as("__v"))
    val nd = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val total = docs.agg(count(lit(1)).as("__total"))
    nd.join(nl, "label").crossJoin(broadcast(v))
      .crossJoin(broadcast(total))
      .select(col("label"), col("n_docs"), col("n_tokens"),
        log(col("n_docs").cast("double") / col("__total").cast("double"))
          .as("log_prior"),
        log(lit(1.0) / (col("n_tokens") + col("__v")).cast("double"))
          .as("log_unseen"))
  }

  /** Classify every document: argmax over classes of
    * `log_prior + Σ_tokens log P(t|c)` with unseen tokens taking the
    * class's smoothed floor. Ties (which need bit-equal float scores —
    * only degenerate inputs) break toward the smaller label. A document
    * with ZERO tokens (empty/whitespace-only text) classifies by prior
    * alone — one output row per distinct doc id, always.
    *
    * Plan shape: tokens × classes (a broadcast of the tiny class list),
    * one broadcast-able join against the model on (label, tok), one
    * (doc, label) partial agg, one per-doc argmax — every shuffle
    * carries (doc, label, double).
    *
    * @return (doc id, predicted label, score rounded 6dp)
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, stats: DataFrame): DataFrame = {
    val t = tokens(docs, idCol, textCol)
    val classes = stats.select(col("label"), col("log_prior"),
      col("log_unseen"))
    val scored = t.crossJoin(broadcast(classes))
      .join(broadcast(model.select(col("label"), col("tok"),
        col("log_prob"))), Seq("label", "tok"), "left")
      .groupBy(col("__doc"), col("label"))
      .agg(
        (first(col("log_prior")) +
          sum(coalesce(col("log_prob"), col("log_unseen")))).as("__score"))
    val byTokens = scored.groupBy(col("__doc").as(idCol))
      .agg(min_by(col("label"),
          struct((-col("__score")).as("ns"), col("label").as("l")))
          .as("predicted"),
        round(max(col("__score")), 6).as("score"))
    // a document whose text tokenizes to zero tokens (empty or
    // whitespace-only) produces no rows in the explode and would get
    // NO prediction — the contract is one row per distinct doc.
    // Such docs classify by prior alone: argmax(log_prior), ties
    // toward the smaller label (the same tie-break as the token path).
    val priorOnly = classes.groupBy()
      .agg(min_by(col("label"),
          struct((-col("log_prior")).as("np"), col("label").as("l")))
          .as("__fb_label"),
        round(max(col("log_prior")), 6).as("__fb_score"))
    docs.select(col(idCol)).distinct()
      .join(byTokens, Seq(idCol), "left")
      .crossJoin(broadcast(priorOnly))
      .select(col(idCol),
        coalesce(col("predicted"), col("__fb_label")).as("predicted"),
        coalesce(col("score"), col("__fb_score")).as("score"))
  }
}
