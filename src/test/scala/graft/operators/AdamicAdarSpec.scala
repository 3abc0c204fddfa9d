package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Graph.adamicAdar]] against hand-computed scores: candidate
  * completeness, existing-edge exclusion, hub-cap semantics, and the
  * deterministic top-k tie-break. */
class AdamicAdarSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3 plus hub 4 wired to {1,2,3}: candidates are the
  // non-adjacent pairs sharing >= 1 neighbor
  private val edges = Seq((1L, 2L), (2L, 3L), (4L, 1L), (4L, 2L),
    (4L, 3L)).toDF("src", "dst")

  test("scores match the hand computation and edges are excluded") {
    val got = Graph.adamicAdar(edges, "src", "dst", topK = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // degrees: 1->2 (2,4), 2->3 (1,3,4), 3->2 (2,4), 4->3 (1,2,3)
    // only non-adjacent pair with common neighbors: (1,3) via 2 and 4
    val want = BigDecimal(1.0 / math.log(3) + 1.0 / math.log(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set((1L, 3L)))
    assert(got((1L, 3L))._1 == 2L)
    assert(math.abs(got((1L, 3L))._2 - want) < 1e-9)
  }

  test("hub cap excludes high-degree centers") {
    // cap 2 excludes centers 2 and 4 (degree 3): (1,3) keeps no
    // eligible common neighbor and the result is empty
    val got = Graph.adamicAdar(edges, "src", "dst", topK = 10,
      maxHubDegree = 2)
    assert(got.count() == 0)
  }

  test("top-k is ordered by rounded score then (u, v)") {
    // star around 10: leaves 1..5 all pairwise non-adjacent, every
    // pair scores identically 1/ln(5) -> tie-break picks lowest (u, v)
    val star = (1L to 5L).map(i => (10L, i)).toDF("src", "dst")
    val got = Graph.adamicAdar(star, "src", "dst", topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("duplicate and reversed input edges collapse before scoring") {
    val dup = edges.unionAll(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val a = Graph.adamicAdar(edges, "src", "dst", topK = 10).collect()
    val b = Graph.adamicAdar(dup, "src", "dst", topK = 10).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
