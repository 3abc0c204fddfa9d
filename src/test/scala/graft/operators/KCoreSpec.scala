package graft.operators

import graft.SparkSpec

/** k-core peeling vs a driver-side reference implementation, plus the
  * closed-form planted structures the gate uses. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // clique 0..5, path 10..19, 4-cycle 20..23, pendant 30–0
  private def planted: Seq[(Long, Long)] = {
    val clique = for (i <- 0L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val path = (10L until 19L).map(i => (i, i + 1))
    val cycle = Seq((20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L))
    clique ++ path ++ cycle :+ ((30L, 0L))
  }

  private def core(edges: Seq[(Long, Long)], k: Int) =
    Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k)
      .as[(Long, Long)].collect().toMap

  test("k=2: clique and cycle survive, path cascades away over rounds") {
    val got = core(planted, 2)
    val want = (0L to 5L).map(_ -> 5L).toMap ++
      (20L to 23L).map(_ -> 2L).toMap
    assert(got === want)
  }

  test("k=3: only the clique remains; k=6: nothing does") {
    assert(core(planted, 3) === (0L to 5L).map(_ -> 5L).toMap)
    assert(core(planted, 6) === Map.empty[Long, Long])
  }

  test("matches the reference peel on a pseudo-random graph") {
    // deterministic edge set from a hash recurrence
    val n = 60
    val edges = (0 until 400).map { i =>
      val a = ((i * 2654435761L) >>> 7) % n
      val b = ((i * 40503L + 17) >>> 3) % n
      (a, b)
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    def referenceCore(k: Int): Map[Long, Long] = {
      var es = edges
      var changed = true
      while (changed) {
        val deg = es.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (x, xs) => x -> xs.size.toLong }
        val bad = deg.filter(_._2 < k).keySet
        changed = bad.nonEmpty
        es = es.filterNot { case (a, b) => bad(a) || bad(b) }
      }
      es.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (x, xs) => x -> xs.size.toLong }
    }
    for (k <- Seq(2, 4, 7))
      assert(core(edges, k) === referenceCore(k), s"diverged at k=$k")
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] {
      Graph.kCore(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0)
    }
  }
}
