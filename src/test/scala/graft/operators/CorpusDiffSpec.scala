package graft.operators

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  private val v1 = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta")
  ).toDF("doc_id", "text")
  private val v2 = Seq(
    (1L, "alpha"),     // unchanged
    (2L, "beta v2"),   // changed
    // 3 removed
    (4L, "delta"),     // unchanged
    (5L, "epsilon")    // added
  ).toDF("doc_id", "text")

  test("per-id classification covers all four statuses") {
    val got = CorpusDiff.diff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"))
  }

  test("merge applies upserts, deletes win on overlap, diff closes loop") {
    import spark.implicits._
    val snap = Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
      .toDF("doc_id", "text")
    val ups = Seq(2L -> "b2", 5L -> "e", 3L -> "c2")
      .toDF("doc_id", "text")
    val dels = Seq(Tuple1(3L), Tuple1(4L)).toDF("doc_id")
    val next = CorpusDiff.merge(snap, ups, dels, "doc_id")
    assert(next.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b2", 5L -> "e"),
      "update 2, insert 5, delete 3 (tombstone beats upsert) and 4")
    // diff against the merged snapshot re-derives exactly the delta
    val d = CorpusDiff.diff(snap, next, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "removed", 5L -> "added"))
  }

  test("scd2 folds snapshots into runs: change, removal, gap re-add") {
    // id 1: stable across 1-3            → one current run [1, null]
    // id 2: changes at v2                → [1,1] closed + [2,null] current
    // id 3: removed after v1             → [1,1] closed
    // id 4: present v1, absent v2, back at v3 with the SAME content
    //       → two runs (the gap is history): [1,1] closed + [3,null]
    val hist = Seq(
      (1L, "a", 1), (1L, "a", 2), (1L, "a", 3),
      (2L, "b", 1), (2L, "b2", 2), (2L, "b2", 3),
      (3L, "c", 1),
      (4L, "d", 1), (4L, "d", 3)).toDF("doc_id", "text", "version")
    val got = CorpusDiff.scd2(hist, "doc_id", "text", "version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      (1L, 1L, None, true),
      (2L, 1L, Some(1L), false), (2L, 2L, None, true),
      (3L, 1L, Some(1L), false),
      (4L, 1L, Some(1L), false), (4L, 3L, None, true)), s"got $got")
  }

  test("summary counts and id checksums are order-independent") {
    val s = CorpusDiff.summary(v1, v2, "doc_id", "text",
        idHasher = c => c)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(s("unchanged") === ((2L, 1L ^ 4L)))
    assert(s("changed") === ((1L, 2L)))
    assert(s("removed") === ((1L, 3L)))
    assert(s("added") === ((1L, 5L)))
    // repartitioned input must produce identical checksums (commutativity)
    val s2 = CorpusDiff.summary(v1.repartition(7), v2.repartition(5),
        "doc_id", "text", idHasher = c => c)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(s2 === s)
  }
}
