package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain join, with the hot key spread") {
    import spark.implicits._
    // heavy skew: 10k rows on key 1, a handful elsewhere
    val large = ((1 to 10000).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (3L, 2L))).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched"))
      .toDF("k", "name")

    val plain = large.join(small, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    val salted = SkewJoin.saltedEquiJoin(large, small, "k", saltFactor = 8)
      .groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(salted === plain)

    // the hot key's rows actually spread across salts
    val spread = large.withColumn("__salt",
        pmod(xxhash64(struct(large.columns.map(col): _*)), lit(8)))
      .filter(col("k") === 1L)
      .select(countDistinct("__salt")).head().getLong(0)
    assert(spread === 8L, "hot key must occupy every salt bucket")
  }

  test("left join keeps unmatched large-side rows exactly once") {
    import spark.implicits._
    val large = Seq((1L, 10L), (9L, 90L)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "name")
    val out = SkewJoin.saltedEquiJoin(large, small, "k", 4, "left")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)).orNull))
    assert(out.toSet === Set((1L, "x"), (9L, null)))
    assert(out.length === 2, "replication must not duplicate unmatched rows")
  }
}
