package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-layout tools for 100 TB (SURVEY §7.4 posture): bucketed tables
  * make fact-fact joins shuffle-free; partitioned layouts make selective
  * scans prune directories. Both are asserted on the physical plan, not
  * just on results. */
class StorageLayoutSpec extends SparkSpec {

  test("bucketed co-located join runs without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // a crashed prior run can leave the managed location behind
    import scala.reflect.io.Directory
    Seq("li_bucketed", "ord_bucketed").foreach(t =>
      new Directory(new java.io.File(s"spark-warehouse/$t")).deleteRecursively())
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_quantity")
    val ord = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    // at this toy scale the small side would auto-broadcast, which hides
    // the property under test (bucketed co-location); force the SMJ path
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_extendedprice").as("rev"))
    joined.count() // finalize AQE
    val p = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key: the join itself needs no
    // Exchange; the only allowed exchange is the post-join aggregation's
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(800))
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("orderkey"))
    assert(exchanges === 0,
      s"bucketed join must not re-shuffle on the join key:\n${p.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE li_bucketed")
      spark.sql("DROP TABLE ord_bucketed")
    }
  }

  test("partitioned layout prunes directories on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    graft.sources.Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter must prune directories:\n${p.take(1200)}")
    // and the pruned read returns exactly the partition's rows
    val expect = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() === expect)
  }
}
