package graft.operators

import graft.SparkSpec

/** Chunk-arithmetic oracle for concat-then-chunk sequence packing. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("offsets, chunk ids, and straddle flags match hand computation") {
    // capacity 10; sizes 4,5,3,12,2 → starts 0,4,9,12,24
    val docs = Seq((1L, 4), (2L, 5), (3L, 3), (4L, 12), (5L, 2))
      .map { case (id, n) => (id, "p", n) }
      .toDF("doc_id", "part", "n_tokens")
    val got = Packing.packBySize(docs, Seq("part"), "doc_id", "n_tokens", 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_off"), r.getAs[Long]("chunk_id"),
          r.getAs[Boolean]("straddles")))).toMap
    assert(got(1L) == ((0L, 0L, false)))
    assert(got(2L) == ((4L, 0L, false)))   // 4+5=9 fits chunk 0 exactly
    assert(got(3L) == ((9L, 0L, true)))    // 9%10+3=12 crosses into chunk 1
    assert(got(4L) == ((12L, 1L, true)))   // 12-token doc spans 2 boundaries
    assert(got(5L) == ((24L, 2L, false)))
  }

  test("partition groups pack independently") {
    val docs = Seq((1L, "a", 7), (2L, "b", 7), (3L, "a", 7), (4L, "b", 7))
      .toDF("doc_id", "part", "n_tokens")
    val got = Packing.packBySize(docs, Seq("part"), "doc_id", "n_tokens", 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("start_off")).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 7L, 4L -> 7L))
  }

  test("a global (no partition columns) packing is rejected") {
    val docs = Seq((1L, 5)).toDF("doc_id", "n_tokens")
    intercept[IllegalArgumentException](
      Packing.packBySize(docs, Nil, "doc_id", "n_tokens", 10))
  }
}
