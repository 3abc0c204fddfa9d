package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-then-chunk sequence packing: documents are concatenated in a
  * deterministic order within each partition group and the token stream
  * is split into fixed-`capacity` training chunks — the packing step
  * that turns a filtered corpus into context-length training sequences.
  * Each doc records where its first token lands (`start_off`), which
  * chunk that is (`chunk_id`), and whether it crosses a chunk boundary
  * (`straddles` — the attention-masking metadata downstream trainers
  * want).
  *
  * Scale shape: one running-sum window per partition group. Groups sort
  * independently — at corpus scale partition by (lang, shard) so no
  * group exceeds a task, exactly like any windowed pipeline stage; the
  * chunk arithmetic itself is a projection.
  */
object Packing {

  def packBySize(df: DataFrame, partCols: Seq[String], orderCol: String,
      sizeCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, "chunk capacity must be positive")
    require(partCols.nonEmpty,
      "packing needs partition columns — a single global ordering " +
        "would serialize the corpus through one task")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("start_off", (col("__cum") - col(sizeCol)).cast("long"))
      .withColumn("chunk_id", floor(col("start_off") / capacity))
      .withColumn("straddles",
        col("start_off") % capacity + col(sizeCol) > capacity)
      .drop("__cum")
  }
}
