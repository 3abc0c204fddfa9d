package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** File-source coverage beyond parquet (SURVEY §2B E4): CSV and JSON
  * scans, proven by round-trip — export a slice of the parquet table,
  * re-read it through the other source, aggregate, and hash-match against
  * the oracle computed over the original table. Any schema/parse bug
  * breaks the match. */
object SourceQueries {

  type Q = (SparkSession, String) => DataFrame

  /** CSV write → CSV scan with explicit schema (E4). */
  val csvRoundtrip: Q = (s, d) => {
    val tmp = Files.createTempDirectory("graft_csv").toString
    Tables.nation(s, d).write.mode("overwrite")
      .option("header", "true").csv(tmp)
    s.read
      .option("header", "true")
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .csv(tmp)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"),
        concat_ws(",", sort_array(collect_list("n_name"))).as("names"))
  }

  /** ORC write → ORC scan (E4): the third columnar format Spark ships. */
  val orcRoundtrip: Q = (s, d) => {
    val tmp = Files.createTempDirectory("graft_orc").toString
    Tables.part(s, d).write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        Exact.sumMoney(col("p_retailprice")).as("total"),
        max("p_size").as("max_size"))
  }

  /** JSON-lines write → JSON scan with schema inference (E4). */
  val jsonRoundtrip: Q = (s, d) => {
    val tmp = Files.createTempDirectory("graft_json").toString
    Tables.supplier(s, d)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").json(tmp)
    s.read.json(tmp)
      .agg(count(lit(1)).as("n"),
        Exact.sumMoney(col("s_acctbal")).as("total_bal"),
        max("s_suppkey").as("max_key"))
  }

  /** JSONL ingest with a quarantine lane (round 5): a feed built
    * in-engine (to_json over id/lang/n_chars), with every 7th line
    * truncated mid-token. [[graft.sources.Ingest.parseJsonl]] must parse
    * the clean lines, null-field + flag the corrupt ones, and preserve
    * their raw payload for replay. The oracle reconstructs Spark's
    * to_json byte format explicitly (no-space separators, struct field
    * order) — only simple unescaped values ride in it. */
  val jsonlQuarantine: Q = (s, d) => {
    val line = to_json(struct(col("doc_id").as("id"), col("lang"),
      col("n_chars")))
    val feed = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 7 === 0, substring(line, 1, 10))
        .otherwise(line).as("line"))
    graft.sources.Ingest.parseJsonl(feed, "line",
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType)
        .add("lang", org.apache.spark.sql.types.StringType)
        .add("n_chars", org.apache.spark.sql.types.LongType))
  }

  /** Partition-pruned scan (round 4): events re-laid-out as
    * `event_date=…/` parquet, then a 7-of-30-day aggregate — the scan
    * lists only the 7 matching directories (LayoutSpec asserts the
    * PartitionFilters); the oracle computes the same range over the raw
    * table. */
  val partitionPrune: Q = (s, d) =>
    graft.sources.Layout.partitionedEvents(s, d)
      .filter(col("event_date").between("2024-01-10", "2024-01-16"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Exact.sumMoney(col("value")).as("total"),
        countDistinct("user_id").as("n_users"))

  /** Bucketed co-located join (round 4): orders ⋈ customer on custkey,
    * both sides pre-bucketed at write time so the join plans with zero
    * shuffle on either input (LayoutSpec asserts no Exchange below the
    * join) — the fact-to-fact join posture at 100 TB, where per-query
    * shuffles of both sides are the dominant cost and broadcast is not
    * an option. */
  val bucketedJoin: Q = (s, d) =>
    graft.sources.Layout.bucketedOrdersWithCustomers(s, d)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumMoney(col("o_totalprice")).as("total"),
        countDistinct("c_custkey").as("n_customers"))

  /** Parquet schema evolution (round 4): a long-lived table gains a
    * column mid-life — old files lack it. Two slices written with
    * diverging schemas, read back under `mergeSchema`: rows from the
    * old slice surface NULL for the new column, and the aggregate
    * proves both slices scanned. The oracle computes the same split
    * from the source table directly. */
  val mergeSchema: Q = (s, d) => {
    val tmp = Files.createTempDirectory("graft_evolve").toString
    val o = Tables.orders(s, d)
    o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/v1")
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        upper(col("o_orderpriority")).as("o_priority"))
      .write.mode("overwrite").parquet(s"$tmp/v2")
    s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
      .groupBy(coalesce(col("o_priority"), lit("<pre-evolution>"))
        .as("prio"))
      .agg(count(lit(1)).as("n"),
        Exact.sumMoney(col("o_totalprice")).as("total"))
  }

  /** Z-order clustering key (round 4): Morton-interleaved
    * (l_partkey, l_suppkey) — sorting by this key clusters BOTH
    * dimensions into the same files, so min/max file stats prune scans
    * filtered on either column. Top-100 by key (deterministic
    * tie-break) hash-gates the exact bit arithmetic against DuckDB. */
  val zorderKey: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.ZOrder.zorderKey(
          Seq(pmod(col("l_partkey"), lit(1024)),
            pmod(col("l_suppkey"), lit(1024))), bits = 10).as("zkey"))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** Zone-map file skipping (round 8,
    * [[graft.sources.Layout.zoneMapPrunedEvents]]): a user-range
    * aggregate served from the range-clustered layout, reading only the
    * files whose persisted (min, max) zone intersects [40, 59] — the
    * data-skipping partitioning can't give a high-cardinality column.
    * The zone map is result-invisible (residual filter keeps
    * exactness), so the oracle is the plain range query. */
  val zonemapPrune: Q = (s, d) =>
    graft.sources.Layout.zoneMapPrunedEvents(s, d, 40L, 59L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Exact.sumMoney(col("value")).as("total"),
        countDistinct("user_id").as("n_users"))

  /** Bloom-sidecar file skipping (round 9,
    * [[graft.sources.Layout.bloomPrunedEvents]]): point lookups on
    * event_id over a HASH-distributed layout — the case zone maps
    * can't skip (no clustering). One ~16 KB filter per file plans the
    * scan driver-side; a Bloom false positive costs an extra file
    * read, never a wrong row, so the oracle is the plain IN query. One
    * probe id (123456789) is deliberately absent. */
  val bloomPrune: Q = (s, d) =>
    graft.sources.Layout.bloomPrunedEvents(s, d,
        Seq(7L, 999L, 4242L, 8888L, 123456789L))
      .select("event_id", "user_id", "event_type", "value")
}
