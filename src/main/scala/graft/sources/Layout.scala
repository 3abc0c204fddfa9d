package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data LAYOUT operators — the two storage disciplines that decide
  * whether a 100 TB table is queryable at all, demonstrated end-to-end
  * against the testdata:
  *
  *  - '''Partition pruning''' ([[partitionedEvents]]): a fact table laid
  *    out as `date=.../part-*.parquet` turns every date-ranged query
  *    into a directory-listing problem — the scan never opens a file
  *    outside the range. LayoutSpec asserts the physical scan carries
  *    the `PartitionFilters`, and the driver gate hash-matches a pruned
  *    aggregate against DuckDB over the raw table.
  *
  *  - '''Bucketing''' ([[bucketedOrdersWithCustomers]]): pre-hashing both
  *    join sides into the same bucket count co-locates matching keys at
  *    WRITE time, so the join plans with zero shuffle — the one-time
  *    layout cost amortizes over every subsequent join on that key,
  *    which is how a fact-to-fact join survives 100 TB (a broadcast
  *    can't, and a per-query shuffle of both sides pays the full
  *    network cost every time). LayoutSpec asserts the bucketed
  *    sort-merge join has NO shuffle exchange on either input.
  *
  * Both layouts are one-time artifacts cached like
  * [[graft.operators.IvfPq.buildOrLoad]]: keyed by source path, marker-
  * committed, rebuilt only when absent — queries measure READ cost, the
  * posture a production table has.
  */
object Layout {

  private def cacheDir: String =
    sys.env.getOrElse("GRAFT_INDEX_DIR",
      sys.props("java.io.tmpdir") + "/graft-index")

  private def keyOf(parts: String*): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Events re-laid-out as parquet partitioned by `event_date`
    * (`to_date(ts)` in the session's UTC). Returns the partitioned
    * read — date filters on it prune at file listing. */
  def partitionedEvents(s: SparkSession, d: String): DataFrame = {
    val dir = Paths.get(cacheDir,
      "events_by_date_" + keyOf(new java.io.File(d).getCanonicalPath))
    val marker = dir.resolve("_built")
    if (!Files.exists(marker)) {
      Tables.events(s, d)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date")
        .parquet(dir.resolve("data").toString)
      Files.createDirectories(dir)
      Files.write(marker, Array.emptyByteArray) // commit point
    }
    s.read.parquet(dir.resolve("data").toString)
  }

  /** Orders and customer saved as tables bucketed by the join key
    * (`o_custkey` / `c_custkey`, same bucket count), then joined —
    * planned WITHOUT a shuffle on either side. Table names carry the
    * source-path key so different SF dirs coexist in one warehouse;
    * rebuild happens only when the catalog lacks them. */
  def bucketedOrdersWithCustomers(s: SparkSession, d: String,
      buckets: Int = 8): DataFrame = {
    val key = keyOf(new java.io.File(d).getCanonicalPath, buckets.toString)
    val ordersTbl = s"graft_orders_b_$key"
    val custTbl = s"graft_customer_b_$key"
    // external tables (explicit path): no dependence on the session's
    // warehouse dir, so any caller session — Verify's, Bench's, a user's
    // — lands the artifact in the cache, not its cwd
    if (!s.catalog.tableExists(ordersTbl)) {
      Tables.orders(s, d).write
        .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
        .option("path", Paths.get(cacheDir, ordersTbl).toString)
        .mode("overwrite").saveAsTable(ordersTbl)
    }
    if (!s.catalog.tableExists(custTbl)) {
      Tables.customer(s, d).write
        .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
        .option("path", Paths.get(cacheDir, custTbl).toString)
        .mode("overwrite").saveAsTable(custTbl)
    }
    s.table(ordersTbl)
      .join(s.table(custTbl), col("o_custkey") === col("c_custkey"))
  }
}
