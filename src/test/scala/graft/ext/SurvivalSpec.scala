package graft.ext

import graft.SparkTestBase

class SurvivalSpec extends SparkTestBase {
  import spark.implicits._

  test("kaplanMeier: textbook curve with events and censoring interleaved") {
    // t=1: 2 events of 5 at risk → S=0.6; t=2: censor only → S holds;
    // t=3: 1 event of 2 at risk → S=0.3; t=4: final censor → S holds.
    val dur = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (4L, 0))
      .toDF("t_days", "ev")
    val out = Survival.kaplanMeier(dur, "t_days", "ev")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == ((5L, 2L, 0L, 0.6)))
    assert(out(2L) == ((3L, 0L, 1L, 0.6)))
    assert(out(3L) == ((2L, 1L, 0L, 0.3)))
    assert(out(4L) == ((1L, 0L, 1L, 0.3)))
  }

  test("kaplanMeier: survival hits exactly 0 when the risk set is consumed") {
    val dur = Seq((1L, 1), (2L, 1)).toDF("t_days", "ev")
    val out = Survival.kaplanMeier(dur, "t_days", "ev")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) == 0.5)
    assert(out(2L) == 0.0) // d = r at the last event time → sentinel path
  }

  test("kaplanMeier: all-censored cohort never drops below 1") {
    val dur = Seq((1L, 0), (5L, 0), (9L, 0)).toDF("t_days", "ev")
    val out = Survival.kaplanMeier(dur, "t_days", "ev").collect()
    assert(out.forall(_.getDouble(4) == 1.0))
    assert(out.map(_.getLong(1)).toSeq.sorted == Seq(1L, 2L, 3L)) // shrinking risk set
  }

  test("random cohorts match a sequential in-memory estimator") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val cohortGen: Gen[List[(Long, Int)]] = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 10L), Gen.oneOf(0, 1)))
    } yield rows

    def reference(dur: Seq[(Long, Int)]): Map[Long, (Long, Long, Long, Double)] = {
      var atRisk = dur.size.toLong
      var logSum = BigDecimal(0)
      dur.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
        val d = rows.count(_._2 == 1).toLong
        val c = rows.size - d
        val term =
          if (d == 0) 0.0
          else if (d < atRisk) math.log(1.0 - d.toDouble / atRisk)
          else -50.0
        logSum += BigDecimal(term).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        val surv = math.exp(logSum.toDouble)
        val row = t -> ((atRisk, d, c.toLong, surv))
        atRisk -= rows.size
        row
      }.toMap
    }

    for (seed <- 1L to 8L) {
      val dur = sample(cohortGen, seed)
      val got = Survival.kaplanMeier(dur.toDF("t_days", "ev"), "t_days", "ev")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      val exp = reference(dur)
      assert(got.keySet == exp.keySet, s"seed $seed")
      got.foreach { case (t, (r, d, c, s)) =>
        val (er, ed, ec, es) = exp(t)
        assert(r == er && d == ed && c == ec && math.abs(s - es) < 1e-6,
          s"seed $seed t=$t: got ($r,$d,$c,$s) expected ($er,$ed,$ec,$es)")
      }
    }
  }
}
