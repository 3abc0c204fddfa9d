package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-matrix statistics for corpus monitoring — the covariance
  * spectrum is the embedding-space analogue of the text tier's
  * zipf/heaps shape diagnostics: a collapsing dominant direction means
  * the encoder (or the corpus mix) degenerated, anisotropy growth
  * means clusters forming, and day-over-day covariance drift is the
  * embedding-drift alarm a retrieval corpus runs next to its text
  * screens.
  *
  * Exactness discipline (the silhouette precedent): components are
  * snapped to a 1/grid dyadic lattice first, so every moment sum is an
  * exact DECIMAL over scaled integers — order-free — and each
  * covariance entry is ONE IEEE division, raw-hashable. The power
  * iteration is a fixed LEFT-FOLD chain (index order) over the
  * bounded d×d matrix, byte-replayable by DuckDB's list_reduce.
  */
object EmbedStats {

  /** Upper-triangle covariance entries of the (quantized) embedding
    * components: cov(i, j) = (n·Σxᵢxⱼ − Σxᵢ·Σxⱼ) / n² (population
    * form) over xq = floor(x·grid + 0.5).
    *
    * Shape: the d² cross-product explode happens MAP-SIDE and
    * collapses into the (i, j) partial aggregate before the exchange —
    * the shuffle carries at most d²/2 rows per map partition
    * regardless of corpus size (d ≤ 128 enforced: d² cells must stay
    * a bounded table). At very large d a TypedImperativeAggregate
    * accumulating the outer product per partition would cut the
    * explode CPU; at d = 64 the explode is one vectorized projection.
    *
    * @return one row per (i ≤ j): (i, j, n, cov) */
  def covariance(df: DataFrame, vecCol: String, grid: Int = 128,
      maxDim: Int = 128): DataFrame = {
    require(grid > 0, s"covariance: grid must be positive: $grid")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val vq = transform(col(vecCol), x =>
      floor(x.cast("double") * grid + 0.5).cast("long"))
    val base = df
      .select(when(col(vecCol).isNull, raise_error(lit(
        "EmbedStats.covariance: NULL vector — drop or impute first")))
        .when(size(col(vecCol)) > maxDim, raise_error(lit(
          s"EmbedStats.covariance: dimension beyond $maxDim — the " +
            "d x d cell table must stay bounded")))
        .otherwise(vq).as("__v"))
    val pairs = base
      .select(posexplode(col("__v")).as(Seq("__i", "__xi")), col("__v"))
      .select(col("__i"), col("__xi"),
        posexplode(col("__v")).as(Seq("__j", "__xj")))
      .filter(col("__j") >= col("__i"))
    val cells = pairs.groupBy(col("__i").as("i"), col("__j").as("j"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__xi").cast(dec)).as("__sx"),
        sum(col("__xj").cast(dec)).as("__sy"),
        sum(col("__xi").cast(dec) * col("__xj").cast(dec)).as("__sxy"))
    cells.select(col("i"), col("j"), col("__n").as("n"),
      ((col("__n").cast(dec) * col("__sxy") - col("__sx") * col("__sy"))
        .cast("double") /
        (col("__n").cast("double") * col("__n") * grid * grid))
        .as("cov"))
  }

  /** Top principal component of the quantized covariance via `iters`
    * power iterations from the uniform start 1/√d — the dominant
    * embedding direction + its Rayleigh eigenvalue and explained
    * share of the trace.
    *
    * The d×d covariance is collected to the driver (BOUNDED: d ≤ 128
    * enforced by [[covariance]] — the Mixing-quota-table class of
    * driver materialization, never data-sized) and the iteration is a
    * fixed left-fold chain in index order, so the whole output is one
    * deterministic IEEE sequence a SQL oracle replays with ordered
    * list folds. On an isotropic corpus the spectrum is near-flat and
    * `iters` steps leave the vector part-converged — determinism, not
    * convergence, is what the gate pins; the planted-direction spec
    * covers semantics.
    *
    * @return one row per dimension: (i, loading, eigenvalue,
    *         explained_share, n) */
  def principalComponent(df: DataFrame, vecCol: String,
      iters: Int = 20, grid: Int = 128): DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"principalComponent: iters must be in [1, 100]: $iters")
    val spark = df.sparkSession
    val covRows = covariance(df, vecCol, grid)
      .select("i", "j", "n", "cov").collect()
    require(covRows.nonEmpty, "principalComponent: empty input")
    val n = covRows.head.getLong(2)
    val d = covRows.map(_.getInt(1)).max + 1
    val c = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      c(r.getInt(0))(r.getInt(1)) = r.getDouble(3)
      c(r.getInt(1))(r.getInt(0)) = r.getDouble(3)
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).reduceLeft(_ + _))
      val norm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
      require(norm > 0, "principalComponent: zero covariance matrix — " +
        "every quantized component is constant")
      v = w.map(_ / norm)
      it += 1
    }
    val lambda = (0 until d).map(i =>
      v(i) * (0 until d).map(j => c(i)(j) * v(j)).reduceLeft(_ + _))
      .reduceLeft(_ + _)
    val trace = (0 until d).map(i => c(i)(i)).reduceLeft(_ + _)
    import spark.implicits._
    v.zipWithIndex.map { case (l, i) =>
      (i, l, lambda, lambda / trace, n) }.toSeq
      .toDF("i", "loading", "eigenvalue", "explained_share", "n")
  }
}
