package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst pushes filters and prunes
  * columns into the vectorized reader, which is the 100 TB-scale posture:
  * never materialize more than the query needs.
  *
  * `events.ts` has shipped in two encodings across driver rounds: parquet
  * INT64 TIMESTAMP(NANOS) (readable only via the `nanosAsLong` legacy
  * flag) and plain TIMESTAMP(MICROS) with `isAdjustedToUTC = false`
  * (which Spark reads as `TIMESTAMP_NTZ`). [[events]] normalizes either
  * to a microsecond `TimestampType` column in the session zone (UTC), so
  * engine and oracle agree regardless of which encoding is on disk.
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
    normalizeTs(table(spark, dir, "events"))
  }

  /** Normalizes the stored `ts` encoding (int64 nanos or TIMESTAMP_NTZ
    * micros) to `TimestampType`. Session zone is UTC everywhere, so the
    * NTZ cast reinterprets the naive value as the same instant. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: epoch-ns (~1.7e18) overflows double
        // precision, so a fp divide would be off by ±1 µs on ~25% of rows
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
