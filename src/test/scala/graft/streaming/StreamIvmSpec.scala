package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Marker-protocol exactly-once semantics of the streaming distinct
  * IVM sink — a replayed batch must be a no-op, and the folded state
  * must equal the direct rebuild. */
class StreamIvmSpec extends SparkSpec {
  import spark.implicits._

  test("replayed batch is skipped; chained folds equal the rebuild") {
    val dir = java.nio.file.Files
      .createTempDirectory("sivm_spec").toString
    val sink = new StreamIvm(dir, Seq("g"), "v", "op")
    val b0 = Seq(("a", 1L, 1), ("a", 1L, 1), ("a", 2L, 1),
      ("b", 5L, 1)).toDF("g", "v", "op")
    sink.write(b0, 0L)
    val afterB0 = sink.counts(spark).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterB0 === Map("a" -> 2L, "b" -> 1L))
    // checkpoint replay of batch 0: marker exists -> no-op, even with
    // different (corrupt) content
    sink.write(Seq(("z", 99L, 1)).toDF("g", "v", "op"), 0L)
    assert(sink.counts(spark).get.filter(col("g") === "z").count() == 0)
    // batch 1: drop one of a's two v=1 copies (distinct unchanged),
    // drop the only v=2 (distinct falls), add b value
    val b1 = Seq(("a", 1L, -1), ("a", 2L, -1), ("b", 7L, 1))
      .toDF("g", "v", "op")
    sink.write(b1, 1L)
    val got = sink.counts(spark).get.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((1L, 1L)), "b" -> ((2L, 2L))))
  }

  test("a delete of a value the state never held fails the batch loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("sivm_spec2").toString
    val sink = new StreamIvm(dir, Seq("g"), "v", "op")
    sink.write(Seq(("a", 1L, 1)).toDF("g", "v", "op"), 0L)
    val ex = intercept[Exception] {
      sink.write(Seq(("a", 99L, -1)).toDF("g", "v", "op"), 1L)
    }
    assert(ex.getMessage.contains("does not hold"))
    // the failed batch must NOT have committed
    assert(sink.counts(spark).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === Map("a" -> 1L))
  }
}
