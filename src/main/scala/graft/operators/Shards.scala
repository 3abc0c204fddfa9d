package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global shuffle into training output shards — the final
  * assembly step of corpus preparation: break every upstream ordering
  * (crawl order, source grouping, dedup survivorship) so each shard is an
  * unbiased sample and the within-shard sequence is decorrelated, while
  * staying a pure function of (salt, id) like [[Splits]] — re-runs,
  * engine changes, and corpus re-partitioning reproduce byte-identical
  * shard layouts, and a grown corpus never reorders the docs two runs
  * both contain relative to each other.
  *
  * Mechanics: the shuffle key is `md5(salt_id)`; its first 8 hex chars
  * pick the shard (`mod numShards`), the full digest orders docs within
  * the shard. md5 rather than xxhash64 for the same audit-posture reason
  * as [[Splits.bucketOf]]: any engine can recompute the layout.
  *
  * Scale shape: [[assign]] is ONE map-only projection (no shuffle — the
  * 100 TB cost is reading the id column). [[write]] adds the single
  * unavoidable exchange: repartition by shard, sort within partitions by
  * the shuffle key, write `partitionBy(shard)` parquet — one pass, no
  * global sort, no driver state.
  */
object Shards {

  /** Append (`shard`, `shuffle_key`): shard membership and within-shard
    * order as pure functions of (salt, id) — derived from the SAME
    * [[Splits.saltedKey]] recipe as split assignment, so the two
    * audit-layout contracts share one definition. */
  def assign(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "graft"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("shuffle_key", Splits.saltedKey(col(idCol), salt))
      .withColumn("shard",
        Splits.bucketOfKey(col("shuffle_key"), numShards).cast("int"))
  }

  /** Materialize the shards: one exchange (hash by shard), a per-task
    * sort on the shuffle key, `partitionBy` parquet layout. Readers get
    * `shard=N/` directories whose file order IS the deterministic
    * training order. */
  def write(df: DataFrame, idCol: String, numShards: Int, path: String,
      salt: String = "graft"): Unit =
    assign(df, idCol, numShards, salt)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
