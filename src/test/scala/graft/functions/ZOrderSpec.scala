package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form oracles for Morton interleaving. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def z2(pairs: (Long, Long)*): Seq[Long] =
    pairs.toDF("x", "y")
      .select(ZOrder.zorderKey(Seq(col("x"), col("y")), bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq

  test("2-D interleaving matches the textbook Morton values") {
    // z(x,y): bit b of x at position 2b, bit b of y at 2b+1
    assert(z2((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (7L, 7L))
      == Seq(0L, 1L, 2L, 3L, 14L, 63L))
  }

  test("keys stay within n*bits bits and grow with either dimension") {
    val keys = z2((255L, 255L))
    assert(keys.head == 65535L, "max 8-bit pair fills 16 bits exactly")
    assert(z2((4L, 0L)).head < z2((0L, 8L)).head,
      "higher bits of either column dominate")
  }

  test("3-column interleaving places bit b of col c at b*n+c") {
    val got = Seq((1L, 1L, 1L), (0L, 0L, 2L))
      .toDF("a", "b", "c")
      .select(ZOrder.zorderKey(
        Seq(col("a"), col("b"), col("c")), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 32L)) // 1+2+4; bit1 of col2 -> position 1*3+2
  }

  test("locality: a quadrant's keys never interleave with its neighbors'") {
    // with bits=8, the 4x4 block at (x,y) in [0,4)^2 occupies keys
    // [0,16) and the block at [4,8)^2 occupies [48,64) — block-diagonal
    // ranges are the data-skipping property
    val low = (for { x <- 0L until 4L; y <- 0L until 4L } yield (x, y))
    val high = (for { x <- 4L until 8L; y <- 4L until 8L } yield (x, y))
    val lowKeys = z2(low: _*)
    val highKeys = z2(high: _*)
    assert(lowKeys.max < highKeys.min,
      "co-located blocks must map to disjoint key ranges")
    assert(lowKeys.sorted == (0L until 16L) &&
      highKeys.sorted == (48L until 64L))
  }

  test("dimension/bit bounds are rejected loudly") {
    intercept[IllegalArgumentException] {
      ZOrder.zorderKey(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zorderKey(Seq(col("x"), col("y")), bits = 32)
    }
  }
}
