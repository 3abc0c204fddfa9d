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
    * rather than silently clamped.
    *
    * Scale shape (the [[CorpusDiff.merge]] discipline): the view is
    * semi/anti-SPLIT against the broadcast delta identities first, so
    * the untouched majority — at 100 TB, essentially all of it — flows
    * through MAP-ONLY with no exchange; only the delta-touched rows are
    * counted, folded against the net, and re-expanded. The delta is the
    * small side by contract (one IVM batch), hence the explicit
    * broadcast. Refresh cost tracks |Δ|, never |V|. */
  def applyDelta(view: DataFrame, delta: DataFrame): DataFrame = {
    val cols = view.columns.toIndexedSeq
    require(delta.columns.toSet == cols.toSet + "op",
      s"delta columns ${delta.columns.mkString(",")} must be the view's " +
        s"(${cols.mkString(",")}) plus op")
    // Net change per distinct row identity; identities netting to zero
    // never touch the view at all.
    val net = delta.groupBy(cols.map(col): _*)
      .agg(sum("op").as("__net"))
      .filter(col("__net") =!= 0)
    val netKeyed = net.select(
      cols.map(c => col(c).as(s"__d_$c")) :+ col("__net"): _*)
    val touchCond = cols.map(c => col(c) <=> col(s"__d_$c"))
      .reduce(_ && _)
    // Broadcast semi/anti hash joins: the view side stays map-only.
    val untouched = view.join(broadcast(netKeyed), touchCond, "left_anti")
    val touched = view.join(broadcast(netKeyed), touchCond, "left_semi")
    // Fold multiplicities for the touched identities only; full outer
    // keeps delta-only identities (pure inserts — a negative net on a
    // row the view lacks raises below). Both sides here are Δ-sized,
    // so the full outer is left unhinted (broadcast doesn't apply).
    val stored = touched.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val folded = stored.join(netKeyed, touchCond, "full_outer")
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
    untouched.unionByName(folded)
  }

  /** One-call refresh: `V' = applyDelta(V, joinDelta(...))`. */
  def refresh(view: DataFrame, aOld: DataFrame, bOld: DataFrame,
      dA: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame =
    applyDelta(view, joinDelta(aOld, bOld, dA, dB, keys))
}
