package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ManifestDigestSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text", "lang")

  test("digest is partition- and order-independent") {
    val m1 = ManifestDigest.manifest(docs, "doc_id", Seq("text", "lang"))
    val m2 = ManifestDigest.manifest(
      docs.repartition(13).orderBy(desc("text")), "doc_id",
      Seq("text", "lang"))
    assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty)
    assert(ManifestDigest.diffBuckets(m1, m2).isEmpty)
  }

  test("diff pinpoints edited, deleted, and added rows' buckets") {
    val base = Seq((1L, "a"), (2L, "b"), (65L, "c")).toDF("id", "t")
    val changed = Seq((1L, "a"), (2L, "B"), (64L, "d")).toDF("id", "t")
    // bucket 1: id 1 same, id 65 deleted; bucket 2: id 2 edited;
    // bucket 0: id 64 added
    val d = ManifestDigest.diffBuckets(
        ManifestDigest.manifest(base, "id", Seq("t")),
        ManifestDigest.manifest(changed, "id", Seq("t")))
      .select("bucket").as[Long].collect().toSet
    assert(d == Set(0L, 1L, 2L))
  }

  test("null columns hash distinctly from empty and from shifts") {
    val a = Seq((1L, Some("a"), None: Option[String])).toDF("id", "t", "u")
    val b = Seq((1L, None: Option[String], Some("a"))).toDF("id", "t", "u")
    val c = Seq((1L, Some("a"), Some(""))).toDF("id", "t", "u")
    val ma = ManifestDigest.manifest(a, "id", Seq("t", "u"))
    assert(ManifestDigest.diffBuckets(ma,
      ManifestDigest.manifest(b, "id", Seq("t", "u"))).count() == 1)
    assert(ManifestDigest.diffBuckets(ma,
      ManifestDigest.manifest(c, "id", Seq("t", "u"))).count() == 1)
  }

  test("count catches the XOR pair-cancellation blind spot") {
    val base = Seq((1L, "x")).toDF("id", "t")
    val doubled = Seq((1L, "x"), (65L, "x")).toDF("id", "t")
    // ids 1 and 65 share bucket 1 but hash differently (id is folded
    // into the row hash), so digest AND count both flag
    val d = ManifestDigest.diffBuckets(
      ManifestDigest.manifest(base, "id", Seq("t")),
      ManifestDigest.manifest(doubled, "id", Seq("t")))
    assert(d.count() == 1)
    // true pair-cancellation needs identical FULL rows, impossible with
    // distinct ids folded in; duplicate ids cancel digests - count flags
    val dup = Seq((1L, "x"), (1L, "x"), (1L, "x")).toDF("id", "t")
    val d2 = ManifestDigest.diffBuckets(
      ManifestDigest.manifest(base, "id", Seq("t")),
      ManifestDigest.manifest(dup, "id", Seq("t")))
      .select("n_rows_a", "n_rows_b").as[(Long, Long)].collect().toSeq
    assert(d2 == Seq((1L, 3L)))
  }
}
