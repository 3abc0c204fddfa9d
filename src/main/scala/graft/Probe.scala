package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    val sigs = docs.select(col("doc_id").as("id"),
      Dedup.minhashSignature(Dedup.shingles(col("text")), 32).as("sig")).cache()
    time("materialize sigs cache") { sigs.count() }
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(7)),
          j => xxhash64(slice(col("sig"), j * 4 + 1, lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val bucketSizes = banded.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("bsz")).filter(col("bsz").between(2, 300))
    val pruned = banded.join(bucketSizes, Seq("band", "band_hash"))
    val pairs = pruned.select(col("band"), col("band_hash"), col("id").as("a"))
      .join(pruned.select(col("band"), col("band_hash"), col("id").as("b")),
        Seq("band", "band_hash"))
      .filter(col("a") < col("b")).select("a","b").distinct()
    time("pairs") { pairs.count() }
    val withSigs = pairs
      .join(sigs.select(col("id").as("a"), col("sig").as("sig_a")), "a")
      .join(sigs.select(col("id").as("b"), col("sig").as("sig_b")), "b")
    time("join-back") { withSigs.count() }
    val est = withSigs.withColumn("est_jaccard",
        round(Dedup.minhashEstimate(col("sig_a"), col("sig_b")), 6))
      .filter(col("est_jaccard") >= 0.3).select("a","b","est_jaccard")
    time("estimate+filter") { est.count() }
    spark.stop()
  }
}
