package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary + id-sequence encoding — the last mile of corpus
  * assembly: after filtering, dedup, mixing, and packing decide WHICH
  * text trains, this turns it into the integer sequences a trainer
  * consumes. Deterministic by construction: vocabulary ids are assigned
  * in (count desc, token asc) order, so re-runs and engine changes
  * reproduce identical encodings.
  *
  * Scale shape: [[vocabulary]] is one word-count aggregate plus a top-V
  * extraction (TakeOrdered — k rows kept per task; the single-partition
  * id-assignment window runs on the ≤V survivors only). [[encode]]
  * broadcast-joins that bounded vocabulary against the exploded tokens
  * and re-assembles per-doc sequences with one (doc, pos, id)-shaped
  * shuffle — ints and ids only, no text after the join.
  */
object Tokenize {

  /** THE tokenizer of the vocab/encode contract — one definition, used
    * by both sides of the vocab join (and by [[TextScore]]): a change
    * here cannot desynchronize vocabulary from encoding (a divergence
    * would silently send every token to the OOV slot). */
  private[operators] def tokenCol(textCol: String) =
    split(lower(col(textCol)), "\\s+")

  private def tokens(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol),
        posexplode(tokenCol(textCol)).as(Seq("p", "tok")))
      .filter(col("tok") =!= "")

  /** Top-`vocabSize` tokens as (tok, token_id 0..V-1), ids in
    * (count desc, token asc) order. Out-of-vocabulary tokens encode as
    * id `vocabSize` (the conventional OOV slot). */
  def vocabulary(df: DataFrame, textCol: String, vocabSize: Int)
      : DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val counts = df
      .select(explode(tokenCol(textCol)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    // Bounded.constPart: bounded-window marker — input is the ≤V
    // limit() survivors, never data rows (see Sequence.assignGlobalSeq)
    counts.orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .withColumn("token_id", (row_number().over(
        Window.partitionBy(Bounded.constPart(col("c")))
          .orderBy(col("c").desc, col("tok"))) - 1).cast("int"))
      .select("tok", "token_id")
  }

  /** Encode each doc as its token-id sequence (space-joined string —
    * directly comparable across engines; a trainer-facing writer would
    * keep the int array). Returns (idCol, n_tokens, n_oov, ids). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, vocabSize: Int): DataFrame =
    tokens(df, idCol, textCol)
      .join(broadcast(vocab), Seq("tok"), "left")
      .withColumn("id", coalesce(col("token_id"), lit(vocabSize)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id") === vocabSize, 1).otherwise(0)).as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("id")))),
          s => s.getField("id").cast("string")), " ").as("ids"))
}
