package graft.ext

import java.sql.Timestamp

import graft.SparkTestBase

class EventStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dailyAnomalies: spike day flagged against its trailing baseline only") {
    // 9 quiet days of 10 events, then a 100-event day: the spike must be
    // flagged, and the spike must NOT inflate its own baseline.
    val rows = (1 to 9).flatMap { d =>
      (1 to 10).map(i => (s"2024-01-0$d".take(10), i))
    }.map { case (day, i) => (ts(f"${day} 12:00:00"), "view", i.toLong) } ++
      (1 to 100).map(i => (ts("2024-01-10 12:00:00"), "view", i.toLong))
    val df = rows.toDF("ts", "event_type", "event_id")
    val out = EventStats.dailyAnomalies(df, "ts", "event_type")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (Option(r.getAs[java.lang.Double]("z")), r.getAs[Boolean]("is_anomaly"))).toMap
    // first 3 days: baseline too thin → null z
    assert(out("2024-01-01")._1.isEmpty)
    assert(out("2024-01-03")._1.isEmpty)
    // a quiet mid-run day: zero variance in baseline → null z (std = 0 guard)
    assert(out("2024-01-09")._1.isEmpty)
    // spike day with an all-constant baseline: std = 0 ⇒ the guard nulls z
    // rather than divide by zero, so jitter one day INSIDE the spike's
    // trailing window (days 3-9) to give the baseline nonzero variance
    val jit = rows ++ Seq((ts("2024-01-05 13:00:00"), "view", 999L))
    val out2 = EventStats.dailyAnomalies(jit.toDF("ts", "event_type", "event_id"),
        "ts", "event_type")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (Option(r.getAs[java.lang.Double]("z")), r.getAs[Boolean]("is_anomaly"))).toMap
    val (zSpike, flagged) = out2("2024-01-10")
    assert(zSpike.exists(_ > 2.0))
    assert(flagged)
    // quiet days with the jittered baseline stay unflagged
    assert(!out2("2024-01-08")._2)
  }

  test("burstiness: metronome → -1-ish, bursty → positive") {
    // user 1: perfectly regular 60s gaps → sigma=0 → B = -1
    val regular = (0 until 10).map(i =>
      (1L, i.toLong, ts("2024-01-01 00:00:00").getTime + i * 60000L))
    // user 2: 9 tiny gaps and one huge gap → heavy burst, B > 0
    val burstTimes = (0 until 9).scanLeft(0L)((acc, _) => acc + 1000L) :+ 3600000L
    val bursty = burstTimes.zipWithIndex.map { case (off, i) =>
      (2L, (100 + i).toLong, ts("2024-01-01 00:00:00").getTime + off)
    }
    // user 3: too few events → excluded
    val few = (0 until 3).map(i =>
      (3L, (200 + i).toLong, ts("2024-01-01 00:00:00").getTime + i * 1000L))
    val df = (regular ++ bursty ++ few)
      .map { case (u, e, ms) => (u, e, new Timestamp(ms)) }
      .toDF("user_id", "event_id", "ts")
    val out = EventStats.burstiness(df, "ts", "user_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("burstiness")).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(approx(out(1L), -1.0, 1e-6))
    assert(out(2L) > 0.3)
  }

  test("userTypeEntropy: uniform = log2 n, single-type = 0") {
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "a"), (2L, "a"), (2L, "a"),
      (3L, "a"), (3L, "a"), (3L, "b")
    ).toDF("user_id", "event_type")
    val out = EventStats.userTypeEntropy(df, "user_id", "event_type")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_types"), r.getAs[Double]("entropy_bits"))).toMap
    assert(out(1L) == (4L, 2.0))
    assert(out(2L) == (1L, 0.0))
    // H(1/3, 2/3) = log2 3 − 2/3 ≈ 0.918296
    assert(out(3L)._1 == 2L)
    assert(approx(out(3L)._2, 0.918296, 1e-6))
  }

  test("seasonalAnomalies: spike flagged against same-dow median only") {
    // Mondays Jan 1/8/15/22 2024: volumes 10,10,10,30 → median 10, the 30
    // flags high; a Tuesday with 30 events and median 30 does not.
    def day(d: String, n: Int, t: String) = (0 until n).map(i =>
      (t, java.sql.Timestamp.valueOf(s"$d 0${i % 10}:00:00")))
    val df = (day("2024-01-01", 10, "click") ++ day("2024-01-08", 10, "click") ++
        day("2024-01-15", 10, "click") ++ day("2024-01-22", 30, "click") ++
        day("2024-01-02", 30, "click") ++ day("2024-01-09", 30, "click"))
      .toDF("event_type", "ts")
    val out = EventStats.seasonalAnomalies(df, "ts", "event_type")
      .collect().map(r => r.getDate(1).toString ->
        (r.getLong(2), r.getDouble(5), r.getBoolean(7))).toMap
    assert(out("2024-01-01") == ((1L, 10.0, false)))
    assert(out("2024-01-22") == ((1L, 10.0, true)))  // 30 > 1.5 × 10
    assert(out("2024-01-02") == ((2L, 30.0, false))) // Tuesday baseline is 30
  }

  test("theilSenTrend: one wild day cannot move the median slope") {
    // volumes 10,20,30,40 on consecutive days (slope 10/day), then a day with
    // 500 events: 6 of 10 pairwise slopes still come from the clean points.
    def day(d: String, n: Int) = (0 until n).map(i =>
      ("click", java.sql.Timestamp.valueOf(s"$d ${"%02d".format(i % 24)}:00:00")))
    val df = (day("2024-01-01", 10) ++ day("2024-01-02", 20) ++
      day("2024-01-03", 30) ++ day("2024-01-04", 40) ++ day("2024-01-05", 500))
      .toDF("event_type", "ts")
    val out = EventStats.theilSenTrend(df, "ts", "event_type").collect().head
    assert(out.getLong(1) == 5L)
    assert(out.getDouble(2) == 10.0, s"slope ${out.getDouble(2)}")
  }

  test("rollingActiveUsers: WAU counts each user once across the window") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 12:00:00"), // same day ×2
      (2L, "2024-01-01 10:00:00"),
      (1L, "2024-01-03 10:00:00"), // user 1 again inside the 7d window
      (3L, "2024-01-09 10:00:00")  // beyond day 1+6 → window excludes day-1 users
    ).map { case (u, s) => (u, java.sql.Timestamp.valueOf(s)) }
      .toDF("user_id", "ts")
    val out = EventStats.rollingActiveUsers(df, "ts", "user_id", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    // observed days only: Jan 1, 3, 9
    assert(out.keySet == Set("2024-01-01", "2024-01-03", "2024-01-09"))
    assert(out("2024-01-01") == ((2L, 2L)))
    assert(out("2024-01-03") == ((1L, 2L))) // users 1,2 active in [12-28, 1-3]
    assert(out("2024-01-09") == ((1L, 2L))) // users 1 (Jan 3) + 3; day-1 aged out
  }

  test("ewmaDaily: weights decay by CALENDAR day gaps, hand-checked") {
    // type A: days 1,2,4 (note the gap) with volumes 10, 20, 40
    val rows =
      (1 to 10).map(i => (ts("2024-01-01 08:00:00"), "A", i.toLong)) ++
      (1 to 20).map(i => (ts("2024-01-02 08:00:00"), "A", i.toLong)) ++
      (1 to 40).map(i => (ts("2024-01-04 08:00:00"), "A", i.toLong))
    val out = EventStats.ewmaDaily(rows.toDF("ts", "event_type", "event_id"),
        "ts", "event_type", decay = 0.9, windowDays = 28)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out("2024-01-01") == ((10L, 10.0)))
    // day 2: (20 + 0.9·10)/(1 + 0.9)
    assert(approx(out("2024-01-02")._2,
      math.round(29.0 / 1.9 * 1e6) / 1e6, 1e-9))
    // day 4: gap day weights by Δdays, not Δrows: (40 + 0.9²·20 + 0.9³·10)
    //        /(1 + 0.81 + 0.729)
    assert(approx(out("2024-01-04")._2,
      math.round((40 + 0.81 * 20 + 0.729 * 10) / (1 + 0.81 + 0.729) * 1e6) / 1e6,
      1e-9))
  }

  test("ewmaDaily: days beyond the window bound stop contributing") {
    val rows =
      (1 to 100).map(i => (ts("2024-01-01 08:00:00"), "A", i.toLong)) ++
      (1 to 10).map(i => (ts("2024-03-01 08:00:00"), "A", i.toLong))
    val out = EventStats.ewmaDaily(rows.toDF("ts", "event_type", "event_id"),
        "ts", "event_type", decay = 0.9, windowDays = 28)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r.getDouble(3))
      .toMap
    // Mar 1 is 60 days past Jan 1 — outside the 28-day window entirely
    assert(out("2024-03-01") == 10.0)
  }

  test("rollingActiveUsersSketch: HLL estimates track the exact rolling counts") {
    val rnd = new scala.util.Random(13)
    // 14 days, ~400 distinct users/day with heavy cross-day overlap
    val rows = for {
      d <- 1 to 14
      _ <- 1 to 600
    } yield (ts(f"2024-01-$d%02d 12:00:00"), rnd.nextInt(1200).toLong)
    val df = rows.toDF("ts", "user_id")
    val exact = EventStats.rollingActiveUsers(df, "ts", "user_id", windowDays = 7)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getLong(1), r.getLong(2))).toMap
    val est = EventStats.rollingActiveUsersSketch(df, "ts", "user_id", windowDays = 7)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getLong(1).toDouble, r.getLong(2).toDouble)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (day, (dau, wau)) =>
      val (ed, ew) = exact(day)
      assert(math.abs(dau - ed) / ed < 0.05, s"$day dau est=$dau exact=$ed")
      assert(math.abs(wau - ew) / ew < 0.05, s"$day wau est=$wau exact=$ew")
      // sketch union can only see MORE users than any single day
      assert(wau >= dau * 0.99)
    }
  }
}
