package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact-arithmetic oracles for int8 scalar quantization. */
class VectorQuantSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
    (2L, Seq(-2.0f, 2.0f, 1.0f, -1.0f)),
    (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
    (4L, Seq(0.001f, -0.0005f, 0.0f, 0.0002f))
  ).toDF("vec_id", "embedding")

  test("codes stay in [-127,127], extremes hit exactly ±127") {
    val got = VectorQuant.quantize(docs, "embedding")
      .select(col("vec_id"), col("sq_codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    got.values.flatten.foreach(c => assert(c >= -127 && c <= 127))
    assert(got(1L).head == 127, "max-magnitude dim must quantize to 127")
    // floor(+0.5) sends half-quotients toward +inf: 63.5 → 64, -63.5 → -63
    assert(got(2L) == Seq(-127, 127, 64, -63))
  }

  test("zero vector: scale 0, all-zero codes, exact round trip") {
    val r = VectorQuant.quantize(docs.filter(col("vec_id") === 3L),
      "embedding").select("sq_scale", "sq_codes").collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getSeq[Int](1).forall(_ == 0))
  }

  test("reconstruction error bounded by scale/2 per dimension") {
    val q = VectorQuant.quantize(docs, "embedding")
    val bad = q.select(col("vec_id"), col("sq_scale"),
        zip_with(transform(col("embedding"), x => x.cast("double")),
          VectorQuant.dequantize(col("sq_codes"), col("sq_scale")),
          (x, y) => abs(x - y)).as("errs"))
      .filter(exists(col("errs"),
        e => e > col("sq_scale") / 2 + lit(1e-12)))
      .count()
    assert(bad == 0, "every dim must reconstruct within scale/2")
  }

  test("quantization is scale-covariant: quantize(k*v) has k*scale, same codes") {
    val scaled = docs.filter(col("vec_id") === 2L)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * 4.0f).as("embedding"))
    val a = VectorQuant.quantize(docs.filter(col("vec_id") === 2L),
      "embedding").select("sq_codes").collect()(0).getSeq[Int](0)
    val b = VectorQuant.quantize(scaled, "embedding")
      .select("sq_codes").collect()(0).getSeq[Int](0)
    assert(a == b, "codes are direction-only; scale carries magnitude")
  }
}
