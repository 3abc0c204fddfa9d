package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2B E37/E38; north-star mandate).
  *
  * Three tiers:
  *
  *  - '''brute force''' (correctness baseline): broadcast the probes, scan
  *    the corpus once, per-probe top-k via window. Exact; cost O(|corpus|·
  *    |probes|·dim) but embarrassingly parallel and shuffle-free until the
  *    k-row-per-probe reduction.
  *  - '''hyperplane LSH''': sign-pattern of `bits` random hyperplanes →
  *    bucket id; `tables` independent hash tables give multi-probe recall.
  *    Corpus is bucketed scan-side; the probe join is an equi-join on
  *    (table, bucket) — at 100 TB the only thing shuffled is (bucket id,
  *    vector) pairs, and a pre-bucketed/bucketed-table layout removes even
  *    that.
  *  - '''IVF''' (inverted file): corpus assigned to its nearest of C
  *    centroids; probes search the `nprobe` nearest lists. Centroids here
  *    are a deterministic sample (id-strided) — at production scale you'd
  *    k-means them; list assignment and multi-list probing are identical.
  *
  * Hyperplanes are seeded deterministically so plans are reproducible
  * across runs and executors (no driver→executor closure randomness).
  */
object AnnSearch {

  /** Deterministic unit-ish hyperplanes: `tables × bits × dim`. */
  private def hyperplanes(tables: Int, bits: Int, dim: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Bucket id of a vector under one table's hyperplanes. */
  private def bucketExpr(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(GraftFunctions.vecDot(vec, typedLit(p.toSeq)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact brute-force top-k: the baseline every approximate tier is
    * recall-scored against. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      probeId: String = "vec_id", probeVec: String = "embedding")
      : DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val p = probes.select(col(probeId).as("probe_id"),
      col(probeVec).as("pvec"))
    val c = corpus.select(col(corpusId).as("cand_id"),
      col(corpusVec).as("cvec"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(p), col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(GraftFunctions.cosineSim(col("pvec"), col("cvec")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Multi-table hyperplane-LSH top-k. Recall grows with `tables`;
    * candidate cost shrinks with `bits`. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 10, seed: Long = 42L,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      probeId: String = "vec_id", probeVec: String = "embedding")
      : DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val dim = corpus.select(size(col(corpusVec))).head().getInt(0)
    val planes = hyperplanes(tables, bits, dim, seed)

    // ONE scan: all tables' bucket ids computed in a single projection,
    // then posexploded — a union of per-table reads would scan the corpus
    // `tables` times
    def bucketed(df: DataFrame, id: String, vec: String, asId: String,
        asVec: String): DataFrame =
      df.select(col(id).as(asId), col(vec).as(asVec),
          posexplode(array((0 until tables).map(t =>
            bucketExpr(col(vec), planes(t))): _*)))
        .withColumnRenamed("pos", "table")
        .withColumnRenamed("col", "bucket")

    val c = bucketed(corpus, corpusId, corpusVec, "cand_id", "cvec")
    val p = bucketed(probes, probeId, probeVec, "probe_id", "pvec")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(p), Seq("table", "bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select("probe_id", "cand_id", "pvec", "cvec").distinct()
      .select(col("probe_id"), col("cand_id"),
        round(GraftFunctions.cosineSim(col("pvec"), col("cvec")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Lloyd's k-means over an embedding column, fully distributed:
    * assignment is a broadcast-centroid argmax; the update step is an
    * element-wise mean via posexplode + (cluster, dim) aggregation. Init
    * is a deterministic id-stride sample, so runs are reproducible.
    * Returns (centroid_id, centvec: array<double>). */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, idCol: String,
      stride: Int, iters: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    var centroids = corpus.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("centroid_id"),
        transform(col(vecCol), x => x.cast("double")).as("centvec"))
    var i = 0
    while (i < iters) {
      // argmax via max_by: a partial-aggregatable one-pass reduction —
      // a row_number window here would sort corpus×centroids rows
      val assigned = corpus
        .select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
        .join(broadcast(centroids))
        .withColumn("__sim",
          GraftFunctions.cosineSim(col("__vec"), col("centvec")))
        .groupBy("__vid")
        .agg(
          max_by(col("centroid_id"),
            struct(col("__sim"), col("centroid_id"))).as("centroid_id"),
          first(col("__vec")).as("__vec"))
        .select(col("centroid_id"), col("__vec"))
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("__vec")))
        .groupBy("centroid_id", "pos")
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centvec"))
      i += 1
    }
    centroids
  }

  /** IVF top-k: k-means lists + nprobe-list search. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      centroidStride: Int = 25, nprobe: Int = 4, kmeansIters: Int = 2,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      probeId: String = "vec_id", probeVec: String = "embedding")
      : DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // trained inverted-file lists; cache: reused by corpus + probe
    // assignment (at production scale this is the persisted index)
    val centroids = kmeansCentroids(corpus, corpusVec, corpusId,
      centroidStride, kmeansIters).cache()

    def assign(df: DataFrame, id: String, vec: String, asId: String,
        asVec: String, lists: Int): DataFrame = {
      val w = Window.partitionBy(asId)
        .orderBy(col("cdist").desc, col("centroid_id"))
      df.select(col(id).as(asId), col(vec).as(asVec))
        .join(broadcast(centroids))
        .select(col(asId), col(asVec), col("centroid_id"),
          GraftFunctions.cosineSim(col(asVec), col("centvec")).as("cdist"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= lists)
        .drop("cdist", "crank")
    }

    val c = assign(corpus, corpusId, corpusVec, "cand_id", "cvec", 1)
    val p = assign(probes, probeId, probeVec, "probe_id", "pvec", nprobe)
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(p), Seq("centroid_id"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select("probe_id", "cand_id", "pvec", "cvec").distinct()
      .select(col("probe_id"), col("cand_id"),
        round(GraftFunctions.cosineSim(col("pvec"), col("cvec")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
