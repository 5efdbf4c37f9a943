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
}
