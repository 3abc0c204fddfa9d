package graft.functions

import graft.SparkSpec

/** Every engine function must be callable from plain SQL — the surface a
  * reference user migrating to `spark.sql(...)` actually touches. One
  * smoke assertion per registered function, including the aggregate and
  * the generator. */
class SqlSurfaceSpec extends SparkSpec {

  private def one[T](sql: String): T = {
    GraftFunctions.register(spark)
    spark.sql(sql).head().get(0).asInstanceOf[T]
  }

  test("vector kernels") {
    assert(math.abs(one[Double](
      "SELECT cosine_sim(array(1.0D,2.0D), array(2.0D,4.0D)) ") - 1.0) < 1e-12)
    assert(one[Double]("SELECT vec_dot(array(1.0D,2.0D), array(3.0D,4.0D))") === 11.0)
    assert(one[Double]("SELECT vec_l2(array(0.0D,0.0D), array(3.0D,4.0D))") === 5.0)
    assert(one[Double]("SELECT vec_norm(array(3.0D,4.0D))") === 5.0)
  }

  test("riff serde round-trips through SQL") {
    val payload = one[Array[Byte]](
      """SELECT riff_decode(riff_encode(
        |  map('Accept', array('text/plain')),
        |  cast('hello' AS BINARY))).payload""".stripMargin)
    assert(new String(payload, "UTF-8") === "hello")
  }

  test("text-hash kernels and sketch") {
    assert(one[Seq[Long]]("SELECT minhash_sig(array('a','b'), 4)").size === 4)
    assert(one[Seq[Long]]("SELECT minhash_text('a b c d e', 8, 3)").size === 8)
    one[Long]("SELECT simhash64(array('a','b'))") // shape: any long
    assert(one[Seq[Long]]("SELECT ngram_hashes('a b c', 2)").size === 2)
    val est = one[Long](
      "SELECT kmv_distinct(x, 64) FROM VALUES (1),(2),(3),(2) AS t(x)")
    assert(est >= 2L && est <= 5L, s"kmv estimate $est")
  }

  test("pq kernels") {
    assert(one[Seq[Int]](
      "SELECT pq_encode(array(1.0D,2.0D), array(0.0D,0.0D), 1, 1)") === Seq(0))
    assert(one[Seq[Double]](
      "SELECT pq_dist_table(array(1.0D,2.0D), array(0.0D,0.0D), 1, 1)")
      === Seq(5.0))
    assert(one[Double](
      "SELECT pq_adc(array(5.0D), array(0), 1)") === 5.0)
  }

  test("rand_project kernel") {
    // 1 output dim, 2 input dims, signs (+1, -1): (3 - 4) / sqrt(1)
    assert(one[Seq[Double]](
      "SELECT rand_project(array(3.0D,4.0D), array(1.0D,-1.0D), 1)")
      === Seq(-1.0))
    // purge_positions rides the same registry — smoke it here too
    assert(one[Seq[String]](
      "SELECT purge_positions(array('a','b','c'), array(1))")
      === Seq("a", "c"))
  }

  test("generator produces one row per n-gram hash") {
    GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT ngram_hashes_gen('a b c d', 2)").count() === 3)
  }
}
