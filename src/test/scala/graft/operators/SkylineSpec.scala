package graft.operators

import graft.SparkSpec

/** Skyline: planted frontiers, duplicate criteria rows, mixed
  * directions, a 3-D brute-force comparison, and the loud cap. */
class SkylineSpec extends SparkSpec {

  import spark.implicits._

  test("planted 2-D frontier, duplicates both kept, minimize works") {
    // maximize size, minimize price: frontier = (1, 10) and the (5, 20)
    // twins; (3, 25) is dominated by the twins, (1, 30) by everything
    val rows = Seq((1L, 1, 10.0), (2L, 5, 20.0), (3L, 5, 20.0),
      (4L, 3, 25.0), (5L, 1, 30.0))
      .toDF("id", "size", "price").repartition(3)
    val got = Skyline.skyline(rows, "id",
        Seq(("size", true), ("price", false)))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("3-D random vs brute force") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble,
        rnd.nextInt(20).toDouble))
    def dom(a: (Double, Double, Double), b: (Double, Double, Double)) =
      a._1 >= b._1 && a._2 >= b._2 && a._3 >= b._3 &&
        (a._1 > b._1 || a._2 > b._2 || a._3 > b._3)
    val want = rows.filter(r => !rows.exists(s =>
      dom((s._2, s._3, s._4), (r._2, r._3, r._4)))).map(_._1).toSet
    val got = Skyline.skyline(
        rows.toDF("id", "x", "y", "z").repartition(5), "id",
        Seq(("x", true), ("y", true), ("z", true)))
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("candidate cap fails loudly on an anti-correlated frontier") {
    // y = -x: every row is on the frontier
    val rows = (1L to 50L).map(i => (i, i.toDouble, -i.toDouble))
      .toDF("id", "x", "y")
    val ex = intercept[IllegalArgumentException] {
      Skyline.skyline(rows, "id", Seq(("x", true), ("y", true)),
        maxCandidates = 10)
    }
    assert(ex.getMessage.contains("survivors > cap"))
  }
}
