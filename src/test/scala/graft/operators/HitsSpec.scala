package graft.operators

import graft.SparkSpec

/** [[Graph.hits]]: driver-side power-iteration reference, the planted
  * dyadic closed form, multi-edge dedup, and hub/auth dual rows. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def ref(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Double], Map[Long, Double]) = {
    val e = edges.distinct
    var hub = e.map(_._1).distinct.map(_ -> 1.0).toMap
    var auth = e.map(_._2).distinct.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val ar = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => hub(x._1)).sum }
      val am = ar.values.max
      auth = ar.map { case (k, v) => k -> v / am }
      val hr = e.groupBy(_._1).map { case (s, es) =>
        s -> es.map(x => auth(x._2)).sum }
      val hm = hr.values.max
      hub = hr.map { case (k, v) => k -> v / hm }
    }
    (hub, auth)
  }

  test("matches a driver-side power iteration on a small digraph") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L),
      (3L, 12L), (4L, 12L), (10L, 1L))
    val got = Graph.hits(edges.toDF("src", "dst"), "src", "dst", 6)
      .collect().map(r =>
        (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val (hub, auth) = ref(edges, 6)
    hub.foreach { case (n, v) =>
      assert(math.abs(got((n, "hub")) - v) < 1e-12, s"hub $n") }
    auth.foreach { case (n, v) =>
      assert(math.abs(got((n, "auth")) - v) < 1e-12, s"auth $n") }
    // node 10 is both an authority and a hub — two rows
    assert(got.contains((10L, "hub")) && got.contains((10L, "auth")))
  }

  test("planted dyadic blocks: odd-block scores halve per iteration") {
    // K(4,8) blocks at even ids, K(2,8) at odd — the q_hits_planted
    // fixture shape; after k iterations the odd-block score is 2^-k
    val edges = (for {
      blk <- 0 until 4
      (hn, an) = if (blk % 2 == 0) (4, 8) else (2, 8)
      h <- 0 until hn; a <- 0 until an
    } yield (blk * 20L + h, blk * 20L + 4 + a)).toSeq
    for (k <- Seq(2, 4)) {
      val got = Graph.hits(edges.toDF("src", "dst"), "src", "dst", k)
        .collect().map(r =>
          (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(got((0L, "hub")) == 1.0 && got((4L, "auth")) == 1.0)
      val expected = math.pow(2.0, -k)
      assert(got((20L, "hub")) == expected, s"k=$k odd hub")
      assert(got((24L, "auth")) == expected, s"k=$k odd auth")
    }
  }

  test("duplicate edges do not double-count") {
    val once = Seq((1L, 2L), (3L, 2L), (3L, 4L))
    val dup = once ++ once ++ once
    val a = Graph.hits(once.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val b = Graph.hits(dup.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(a == b)
  }
}
