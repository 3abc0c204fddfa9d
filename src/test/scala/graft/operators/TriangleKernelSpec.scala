package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The edge-iterator (adjacency-intersect) triangle kernel must produce
  * BIT-IDENTICAL per-node counts to the wedge-closure kernel — same
  * orientation, same triangles, different shuffle shape. */
class TriangleKernelSpec extends SparkSpec {
  import spark.implicits._

  private def counts(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("adjacency kernel equals wedge kernel on the co-purchase graph") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
    val edges = li.alias("x")
      .join(li.alias("y"), Seq("l_orderkey"))
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    val wedge = counts(Graph.trianglesWedgeKernel(edges, "src", "dst"))
    val adj = counts(Graph.trianglesAdjKernel(edges, "src", "dst"))
    assert(adj == wedge)
    assert(wedge.nonEmpty)
  }

  test("kernels agree on a hand-built graph with hubs and danglers") {
    // K4 on {1,2,3,4} (4 triangles/node... each node in 3 triangles),
    // a pendant 5-1, an isolated edge 6-7, plus a hub 8 wired to
    // {1,2,3} adding triangles through existing K4 edges
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (6L, 7L), (8L, 1L), (8L, 2L), (8L, 3L))
      .toDF("src", "dst")
    val wedge = counts(Graph.trianglesWedgeKernel(edges, "src", "dst"))
    val adj = counts(Graph.trianglesAdjKernel(edges, "src", "dst"))
    assert(adj == wedge)
    // K4 gives each of 1..4 three triangles; hub 8 closes {8,1,2},
    // {8,1,3}, {8,2,3} adding 3 to node 8, 2 each to 1,2,3
    assert(wedge.toMap == Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 3L,
      8L -> 3L))
  }
}
