package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) query: the rows no other row dominates —
  * "cheapest for the size", "fastest for the cost", the multi-criteria
  * shortlist primitive. Row s dominates row r iff s is ≥ r on every
  * criterion and strictly better on at least one (rows equal on ALL
  * criteria dominate neither way and BOTH survive).
  *
  * Distributed shape (the classic two-phase skyline): a per-partition
  * LOCAL skyline first — any row dominated inside a partition is
  * dominated globally, so the map-only pass discards the bulk and is
  * the only stage that touches the full table; survivors (a superset of
  * the answer, usually orders of magnitude smaller) then settle
  * dominance exactly in one broadcast anti-join. The candidate count is
  * guarded LOUDLY: a pathological anti-correlated dataset whose skyline
  * IS the table would otherwise quietly go quadratic.
  *
  * The local pass is genuinely imperative per-partition logic (a
  * dominance-pruning scan), so it is one of the repo's rare deliberate
  * `mapPartitions` — on (id, criteria-vector) pairs only, never payload
  * rows.
  */
object Skyline {

  private[operators] def dominates(a: Seq[Double], b: Seq[Double])
      : Boolean = {
    var allGe = true
    var oneGt = false
    var i = 0
    while (i < a.length && allGe) {
      if (a(i) < b(i)) allGe = false
      else if (a(i) > b(i)) oneGt = true
      i += 1
    }
    allGe && oneGt
  }

  private[operators] def localSkyline(
      rows: Iterator[(Long, Seq[Double])]): Iterator[(Long, Seq[Double])] = {
    val kept = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double])]()
    rows.foreach { r =>
      if (!kept.exists(k => dominates(k._2, r._2))) {
        val survivors = kept.filterNot(k => dominates(r._2, k._2))
        kept.clear()
        kept ++= survivors
        kept += r
      }
    }
    kept.iterator
  }

  /** Frontier rows of `df` under the given criteria.
    *
    * @param idCol  unique row id (duplicated ids double-report)
    * @param dims   (column, maximize) per criterion — `false` minimizes
    * @param maxCandidates loud cap on local-skyline survivors before the
    *                      exact quadratic merge
    */
  def skyline(df: DataFrame, idCol: String, dims: Seq[(String, Boolean)],
      maxCandidates: Int = 20000): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one criterion")
    val spark = df.sparkSession
    import spark.implicits._
    // a non-numeric or null id would cast to NULL silently, collapsing
    // every such row onto one id and corrupting both the local merge
    // and the final semi-join — fail loudly instead (the repo's
    // raise_error guard idiom)
    val guardedId = {
      val c = col(idCol).cast("long")
      when(c.isNull, raise_error(concat(
        lit(s"skyline: idCol '$idCol' must be non-null and numeric, got "),
        coalesce(col(idCol).cast("string"), lit("NULL")))))
        .otherwise(c)
    }
    // orient every criterion as MAXIMIZE; exact for integers and 2-dp
    // money doubles alike (comparison-only — no arithmetic)
    val vecs = df.select(guardedId.as("id"),
        array(dims.map { case (c, maximize) =>
          val d = col(c).cast("double")
          (if (maximize) d else -d).as(c)
        }: _*).as("v"))
      .as[(Long, Seq[Double])]
    val local = vecs.mapPartitions(localSkyline).toDF("id", "v")
      .localCheckpoint() // the merge reads it twice (both join sides)
    val n = local.count()
    require(n <= maxCandidates,
      s"skyline: $n local-skyline survivors > cap $maxCandidates — the " +
        "frontier itself is near-table-sized; add a criterion or raise " +
        "the cap knowingly")
    val winners = local.alias("a")
      .join(broadcast(local.alias("b")),
        Skyline.dominatesCol(col("b.v"), col("a.v")), "left_anti")
      .select(col("a.id").as("id"))
    df.join(winners.withColumnRenamed("id", idCol), Seq(idCol),
      "left_semi")
  }

  /** Column-level dominance predicate over equal-length double arrays:
    * b dominates a. */
  private def dominatesCol(b: org.apache.spark.sql.Column,
      a: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val pairs = zip_with(b, a, (x, y) => struct((x >= y).as("ge"),
      (x > y).as("gt")))
    forall(pairs, p => p.getField("ge")) &&
      exists(pairs, p => p.getField("gt"))
  }
}
