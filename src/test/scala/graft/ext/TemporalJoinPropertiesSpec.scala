package graft.ext

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated differentials for the temporal joins: random keyed
  * point/interval/state tables vs in-memory brute force. Fixed seeds keep the
  * suite deterministic (same convention as MetricPropertiesSpec — the
  * scalatestplus bridge isn't on the offline classpath).
  */
class TemporalJoinPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // --- as-of join -----------------------------------------------------------

  private val leftGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(5, 60)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 500L)))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }

  /** Right rows get UNIQUE (key, time) pairs — with duplicate timestamps the
    * "latest at-or-before" row is ambiguous and brute force couldn't pin one.
    */
  private val rightGen: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(3, 40)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 500L)))
  } yield rows.distinct.map { case (k, t) => (k, t, s"p${k}_$t") }

  test("asOf equals brute-force latest-at-or-before on random tables") {
    (1L to 6L).foreach { seed =>
      val ls = sample(leftGen, seed)
      val rs = sample(rightGen, seed + 100)
      val got = AsOfJoin.asOf(
          ls.toDF("event_id", "k", "t"), rs.toDF("rk", "rt", "payload"),
          "k", "rk", "t", "rt", Seq("payload"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      val expected = ls.map { case (id, k, t) =>
        val cands = rs.filter { case (rk, rt, _) => rk == k && rt <= t }
        id -> cands.sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("asOfChunked equals brute force on random tables across chunk widths") {
    (1L to 4L).foreach { seed =>
      val ls = sample(leftGen, seed)
      val rs = sample(rightGen, seed + 100)
      val expected = ls.map { case (id, k, t) =>
        val cands = rs.filter { case (rk, rt, _) => rk == k && rt <= t }
        id -> cands.sortBy(_._2).lastOption.map(_._3)
      }.toMap
      Seq(13L, 128L, 10000L).foreach { chunkMs =>
        val got = AsOfJoin.asOfChunked(
            ls.toDF("event_id", "k", "t"), rs.toDF("rk", "rt", "payload"),
            "k", "rk", "t", "rt", Seq("payload"), chunkMs)
          .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
        assert(got == expected, s"seed $seed chunkMs $chunkMs")
      }
    }
  }

  // --- range join -----------------------------------------------------------

  private val pointsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(5, 80)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 400L)))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }

  /** Intervals include empty (len 0 → end <= start) and long ones. */
  private val intervalsGen: Gen[List[(Long, Long, Long, Long)]] = for {
    n <- Gen.choose(3, 50)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 400L), Gen.choose(0L, 90L)))
  } yield rows.zipWithIndex.map { case ((k, s, len), i) =>
    (1000L + i, k, s, s + len)
  }

  test("rangeJoinPairs equals brute-force point-in-interval on random tables") {
    (1L to 6L).foreach { seed =>
      val ps = sample(pointsGen, seed)
      val ivs = sample(intervalsGen, seed + 100)
      Seq(7L, 64L, 1000L).foreach { width =>
        val got = RangeJoin.rangeJoinPairs(
            ps.toDF("pid", "k", "t"), ivs.toDF("iid", "ik", "s", "e"),
            "k", "ik", "t", "s", "e", width)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val expected = (for {
          (pid, k, t) <- ps
          (iid, ik, s, e) <- ivs
          if k == ik && t >= s && t < e
        } yield (pid, iid)).toSet
        assert(got == expected, s"seed $seed width $width")
      }
    }
  }
}
