package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for equi-JOIN views — the companion of
  * [[IncrementalAgg]] (which maintains rollups): a materialized
  * `A ⋈ B` stays current under signed row deltas on BOTH inputs
  * without re-running the join over the full tables.
  *
  * The textbook delta algebra (signed multisets; Blakeley et al.
  * SIGMOD'86, Griffin & Libkin SIGMOD'95):
  * `ΔV = ΔA ⋈ B_old  +  A_old ⋈ ΔB  +  ΔA ⋈ ΔB`, with each output
  * row's sign the PRODUCT of its input signs — the cross term corrects
  * the double-count when both sides change in one batch (an inserted
  * fact joining a deleted dimension row nets to zero, a deleted-deleted
  * pair nets to one removal).
  *
  * Scale shape: each term joins a DELTA against a base (or the other
  * delta) — O(|Δ| · join fan-out) work, never O(|A|·|B|); the base
  * tables are probed on the join key only (AQE broadcasts small
  * deltas). Applying the delta costs one group-by over the delta rows
  * + one null-safe row-identity join against the view — O(|ΔV| + the
  * touched view rows). Nothing rescans both bases.
  */
object IncrementalJoin {

  /** The signed delta of the inner equi-join view `A ⋈ B` on `keys`.
    *
    * @param aOld pre-delta state of A
    * @param bOld pre-delta state of B
    * @param dA   signed A-delta: A's columns + `op` (+1 insert / −1
    *             delete; deletes must replicate the stored row exactly)
    * @param dB   signed B-delta, same contract
    * @return view columns + `op` — feed to [[applyDelta]]
    */
  def joinDelta(aOld: DataFrame, bOld: DataFrame, dA: DataFrame,
      dB: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "join keys required")
    def signed(df: DataFrame) = {
      require(df.columns.contains("op"),
        "delta frames carry an `op` column (+1/-1)")
      df
    }
    val da = signed(dA).withColumnRenamed("op", "__opA")
    val db = signed(dB).withColumnRenamed("op", "__opB")
    val p1 = da.join(bOld, keys).withColumn("op", col("__opA"))
      .drop("__opA")
    val p2 = aOld.join(db, keys).withColumn("op", col("__opB"))
      .drop("__opB")
    val p3 = da.join(db, keys)
      .withColumn("op", col("__opA") * col("__opB"))
      .drop("__opA", "__opB")
    p1.unionByName(p2).unionByName(p3)
  }

  /** Fold a signed delta into a materialized multiset view: per
    * distinct row, new multiplicity = stored multiplicity + net delta;
    * rows netting to zero vanish, rows netting above one replicate.
    * Row identity is NULL-SAFE on every column (a null attribute is
    * the same row on both sides — the [[IncrementalAgg]] `<=>`
    * discipline). Negative net multiplicities mean the delta deletes a
    * row the view never held — rejected loudly in the output plan
    * rather than silently clamped. */
  def applyDelta(view: DataFrame, delta: DataFrame): DataFrame = {
    val cols = view.columns.toIndexedSeq
    require(delta.columns.toSet == cols.toSet + "op",
      s"delta columns ${delta.columns.mkString(",")} must be the view's " +
        s"(${cols.mkString(",")}) plus op")
    val net = delta.groupBy(cols.map(col): _*)
      .agg(sum("op").as("__net"))
    val stored = view.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val joined = stored.join(net.select(
        cols.map(c => col(c).as(s"__d_$c")) :+ col("__net"): _*),
      cols.map(c => col(c) <=> col(s"__d_$c")).reduce(_ && _),
      "full_outer")
    joined
      .select(cols.map(c => coalesce(col(c), col(s"__d_$c")).as(c)) :+
        (coalesce(col("__c"), lit(0L)) + coalesce(col("__net"), lit(0L)))
          .as("__n"): _*)
      .withColumn("__n",
        when(col("__n") < 0, raise_error(concat(
          lit("incremental join: delta deletes a row the view does not " +
            "hold (net "), col("__n").cast("string"), lit(")"))))
          .otherwise(col("__n")))
      .filter(col("__n") > 0)
      .select(cols.map(col) :+
        explode(sequence(lit(1L), col("__n"))).as("__i"): _*)
      .drop("__i")
  }

  /** One-call refresh: `V' = applyDelta(V, joinDelta(...))`. */
  def refresh(view: DataFrame, aOld: DataFrame, bOld: DataFrame,
      dA: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame =
    applyDelta(view, joinDelta(aOld, bOld, dA, dB, keys))
}
