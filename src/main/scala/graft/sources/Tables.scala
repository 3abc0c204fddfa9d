package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst pushes filters and prunes
  * columns into the vectorized reader, which is the 100 TB-scale posture:
  * never materialize more than the query needs.
  *
  * `events.ts` is written as parquet INT64 TIMESTAMP(NANOS), which Spark
  * only reads via the `nanosAsLong` legacy flag; [[events]] normalizes it to
  * a microsecond `TimestampType` column (truncating, exactly as DuckDB 1.x
  * does when casting TIMESTAMP_NS to TIMESTAMP), so engine and oracle agree.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Events with `ts` as a proper microsecond timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      // integer division: epoch-ns (~1.7e18) overflows double precision,
      // so a fp divide here would be off by ±1 µs on ~25% of rows
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
