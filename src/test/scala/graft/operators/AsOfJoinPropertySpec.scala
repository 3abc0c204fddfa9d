package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized differential oracle for the custom as-of plan node: on
  * arbitrary small inputs (null carries included) the node, the windowed
  * formulation, and a driver-side reference implementation must agree —
  * with and without tolerance. Catches merge-state bugs (stale match
  * reuse, boundary ties, null handling) that fixed fixtures miss. */
class AsOfJoinPropertySpec extends SparkSpec {

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private case class L(event_id: Long, k: Long, ts: Timestamp)
  private case class R(k: Long, ts: Timestamp, v: Option[Double])

  // distinct (k, ts) on the right → the scala reference needs no
  // carry-value tie-break and is exact
  private val genCase = for {
    nl <- Gen.chooseNum(0, 25)
    nr <- Gen.chooseNum(0, 25)
    ls <- Gen.listOfN(nl, for {
      k <- Gen.chooseNum(0L, 4L); m <- Gen.chooseNum(0, 50)
    } yield (k, m))
    rsRaw <- Gen.listOfN(nr, for {
      k <- Gen.chooseNum(0L, 4L); m <- Gen.chooseNum(0, 50)
      v <- Gen.option(Gen.chooseNum(1, 9).map(_.toDouble))
    } yield ((k, m), v))
    tol <- Gen.option(Gen.const(10))
  } yield {
    val left = ls.zipWithIndex.map { case ((k, m), i) => L(i.toLong, k, t(m)) }
    val right = rsRaw.toMap.toSeq.map { case ((k, m), v) => R(k, t(m), v) }
    (left, right, tol)
  }

  private def reference(left: Seq[L], right: Seq[R],
      tolMin: Option[Int]): Set[(Long, Option[Timestamp], Option[Double])] =
    left.map { l =>
      val cand = right.filter(r => r.k == l.k && !r.ts.after(l.ts))
      val m = if (cand.isEmpty) None else Some(cand.maxBy(_.ts.getTime))
      val inTol = m.filter(r => tolMin.forall(tm =>
        r.ts.getTime >= l.ts.getTime - tm * 60000L))
      (l.event_id, inTol.map(_.ts), inTol.flatMap(_.v))
    }.toSet

  test("property: node ≡ windowed ≡ reference on random inputs") {
    import spark.implicits._
    var seed = Seed(7L)
    for (round <- 1 to 30) {
      val (l, r, tol) = genCase.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val lDf = l.map(x => (x.event_id, x.k, x.ts)).toDF("event_id", "k", "ts")
      val rDf = r.map(x => (x.k, x.ts, x.v)).toDF("k", "ts", "v")
      val tolS = tol.map(m => s"$m MINUTES")
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.select("event_id", "asof_ts", "asof_v").collect()
          .map(x => (x.getLong(0), Option(x.getTimestamp(1)),
            if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet
      val node = collect(AsOfJoin(lDf, rDf, "k", "ts", "ts", Seq("ts", "v"), tolS))
      val win = collect(AsOfJoin.windowed(lDf, rDf, "k", "ts", "ts", Seq("ts", "v"), tolS))
      val ref = reference(l, r, tol)
      assert(node === ref, s"round $round (tol=$tol): node vs reference")
      assert(win === ref, s"round $round (tol=$tol): windowed vs reference")
    }
  }

  test("property: node ≡ windowed with duplicate (key, ts) right rows") {
    import spark.implicits._
    val genDup = for {
      nl <- Gen.chooseNum(1, 15)
      nr <- Gen.chooseNum(1, 30)
      ls <- Gen.listOfN(nl, Gen.chooseNum(0, 20))
      rs <- Gen.listOfN(nr, for {
        m <- Gen.chooseNum(0, 20)
        v <- Gen.option(Gen.chooseNum(1, 5).map(_.toDouble))
      } yield (m, v))
    } yield (ls, rs)
    var seed = Seed(99L)
    for (round <- 1 to 20) {
      val (ls, rs) = genDup.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val lDf = ls.zipWithIndex
        .map { case (m, i) => (i.toLong, 1L, t(m)) }.toDF("event_id", "k", "ts")
      val rDf = rs.map { case (m, v) => (1L, t(m), v) }.toDF("k", "ts", "v")
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.select("event_id", "asof_ts", "asof_v").collect()
          .map(x => (x.getLong(0), Option(x.getTimestamp(1)),
            if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet
      val node = collect(AsOfJoin(lDf, rDf, "k", "ts", "ts", Seq("ts", "v")))
      val win = collect(AsOfJoin.windowed(lDf, rDf, "k", "ts", "ts", Seq("ts", "v")))
      assert(node === win, s"round $round: tie-break divergence")
    }
  }
}
