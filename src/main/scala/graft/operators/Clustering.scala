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
