package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus clustering as a first-class OUTPUT — the step behind
  * SemDeDup-style semantic organization, cluster-balanced diversity
  * sampling, and curriculum grouping: every vector gets a cluster id
  * (and its similarity to the centroid), rather than the clusters
  * staying internal to an index build ([[graft.operators.IvfPq]]) or a
  * dedup pass ([[Dedup.semanticNearDupKmeans]]).
  *
  * Determinism contract: seeds are the `k` lowest-xxhash ids, the
  * assignment argmax breaks ties to the largest centroid id (the
  * [[AnnSearch.argmaxCentroid]] rule, shared with the k-means loop),
  * so byte-identical vectors ALWAYS co-assign — re-runs, engine
  * changes, and corpus re-partitioning reproduce the same clustering.
  *
  * Scale shape: training is [[AnnSearch.kmeansCentroids]] (vectors
  * never enter an exchange — assignment folds each row against ONE
  * broadcast centroid row); the final assignment is the same
  * broadcast-fold, map-only. `spark.graft.ann.maxCentroids` bounds the
  * broadcast row, failing loudly past the configured cap.
  */
object Clustering {

  /** Returns (idCol, cluster_id, centroid_sim): the trained cluster
    * each vector lands in and its cosine to that centroid (rounded
    * 6dp — the cross-engine comparison grain). Other input columns are
    * dropped — join back by id to re-attach them. */
  def assign(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 2): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val cents = AnnSearch.kmeansCentroids(df, vecCol, idCol, k, iters)
    val centArr = AnnSearch.centroidRow(cents)
    val best = AnnSearch.argmaxCentroid(col("__vec"))
    df.select(col(idCol), col(vecCol).as("__vec"))
      .join(broadcast(centArr))
      .select(col(idCol),
        best.getField("centroid_id").as("cluster_id"),
        round(best.getField("sim"), 6).as("centroid_sim"))
  }

  /** Centroid silhouette — the cluster-quality monitor next to
    * [[assign]]: per point `s = (b − a) / max(a, b)` with `a` the L2
    * distance to the OWN cluster's centroid and `b` the nearest OTHER
    * centroid (the simplified/centroid silhouette — O(n·k) instead of
    * the O(n²) pairwise form, the only form that exists at corpus
    * scale), averaged per cluster. Near 1: tight and separated; near
    * 0: on a boundary; negative: probably mis-assigned — the number a
    * clustering-based curation step tracks round over round.
    *
    * Distributed shape: centroids are per-(cluster, dim) means off ONE
    * posexplode aggregate (k·d rows), re-packed and BROADCAST (k
    * guarded by `maxClusters`); each point then scores against all k
    * in a map-only pass — n·k rows, never n². Per-cluster means ride
    * QUANTIZED silhouettes (⌊s·10⁶⌋ as exact longs), so the cross-row
    * sum is order-free; mean_s is one fixed division chain.
    *
    * Cross-engine exactness: the distance fold is dimension-ordered in
    * both engines and every per-row chain is deterministic; the
    * centroid MEANS are sums of the input components, so they are
    * order-free only when components sit on a fixed-point grid —
    * quantize upstream (the registered gate snaps to 1/128) for
    * hash-exact results on float corpora.
    *
    * Loud degenerates: a NULL cluster assignment (an unassigned point
    * would silently skew its cluster's mean), fewer than 2 clusters
    * (b does not exist), more than `maxClusters`. A point equidistant
    * at 0 from two centroids scores 0 (the standard a = b
    * convention).
    *
    * @return one row per cluster: (clusterCol, n, mean_s) — mean_s at
    *         1e-6 grain */
  def silhouetteCentroid(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, maxClusters: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("__id"),
      when(col(clusterCol).isNull, raise_error(lit(
        "Clustering.silhouetteCentroid: NULL cluster assignment — an " +
          "unassigned point silently skews its cluster's mean; filter " +
          "or assign explicitly first")))
        .otherwise(col(clusterCol)).as("__cl"),
      // loud on a NULL vector or NULL component (r14 ADVICE): sum()
      // would skip the element while count(lit(1)) still counts it,
      // silently biasing the centroid — impute or drop upstream
      when(col(vecCol).isNull, raise_error(lit(
        "Clustering.silhouetteCentroid: NULL vector — drop or impute " +
          "the row first")))
        .when(exists(col(vecCol), x => x.isNull), raise_error(lit(
          "Clustering.silhouetteCentroid: NULL vector component — the " +
            "centroid mean would silently skip it; impute or drop the " +
            "row first")))
        .otherwise(transform(col(vecCol), x => x.cast("double")))
        .as("__v"))
    val expl = base.select(col("__cl"),
      posexplode(col("__v")).as(Seq("__p", "__x")))
    // __cnt: contributors per (cluster, position) — positions are
    // contiguous from posexplode, so mixed vector lengths WITHIN a
    // cluster show as min(__cnt) ≠ max(__cnt) (the tail positions see
    // fewer points); checked on the bounded k×dim table below
    val cent = expl.groupBy(col("__cl").as("__cc"), col("__p"))
      .agg((sum("__x") / count(lit(1))).as("__m"),
        count(lit(1)).as("__cnt"))
    // constPart needs a NUMERIC anchor — the cluster key may be a
    // string, so anchor on its length
    val wAll = Window.partitionBy(
      Bounded.constPart(length(col("__cc").cast("string"))))
    val centArr = cent.groupBy(col("__cc"))
      .agg(sort_array(collect_list(struct(col("__p"), col("__m"))))
        .as("__ms"),
        (min("__cnt") === max("__cnt")).as("__dimOk"))
      .select(col("__cc"), col("__dimOk"),
        transform(col("__ms"), s => s.getField("__m")).as("__cent"))
      .withColumn("__cent",
        when(count(lit(1)).over(wAll) > maxClusters, raise_error(lit(
          s"Clustering.silhouetteCentroid: more than $maxClusters " +
            "clusters — the centroid table broadcasts")))
          // mixed vector lengths (r14 ADVICE): within-cluster via the
          // contributor-count check, cross-cluster via the bounded
          // window — either would otherwise surface as null distances
          // and a misleading 'need at least 2 clusters' raise
          .when(!col("__dimOk") ||
            min(size(col("__cent"))).over(wAll) =!=
              max(size(col("__cent"))).over(wAll), raise_error(lit(
            "Clustering.silhouetteCentroid: mixed vector lengths — " +
              "every point needs the same dimensionality")))
          .otherwise(col("__cent")))
      .drop("__dimOk")
    val dists = base.crossJoin(broadcast(centArr))
      .withColumn("__dist", sqrt(aggregate(
        zip_with(col("__v"), col("__cent"), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, t) => acc + t)))
    val perPoint = dists.groupBy(col("__id"), col("__cl"))
      .agg(max(when(col("__cl") === col("__cc"), col("__dist")))
        .as("__a"),
        min(when(col("__cl") =!= col("__cc"), col("__dist"))).as("__b"))
    val s = perPoint.select(col("__cl"),
      when(col("__b").isNull, raise_error(lit(
        "Clustering.silhouetteCentroid: need at least 2 clusters — " +
          "no 'nearest other centroid' exists")))
        .otherwise(
          when(greatest(col("__a"), col("__b")) === 0.0, lit(0.0))
            .otherwise((col("__b") - col("__a")) /
              greatest(col("__a"), col("__b")))).as("__s"))
    s.groupBy(col("__cl").as(clusterCol))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("__s") * lit(1000000.0)).cast("long"))
          .cast("double") / count(lit(1)).cast("double") /
          lit(1000000.0)).as("mean_s"))
  }

  /** Cluster-balanced diversity sample: up to `perCluster` docs per
    * cluster, ranked by content hash (deterministic) — the
    * cluster-stratified sampling a diversity-balanced corpus uses
    * instead of uniform sampling (uniform oversamples dense regions).
    * [[TopK.perGroup]] bounds every cluster's survivors per task. */
  def diversitySample(df: DataFrame, idCol: String, vecCol: String,
      k: Int, perCluster: Int, iters: Int = 2): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive, got $perCluster")
    val assigned = assign(df, idCol, vecCol, k, iters)
      .withColumn("__rk", md5(col(idCol).cast("string")))
    TopK.perGroup(assigned, Seq("cluster_id"), "__rk", perCluster,
        desc = false, tieBreak = Seq(idCol))
      .select(col("cluster_id"), col(idCol))
  }
}
