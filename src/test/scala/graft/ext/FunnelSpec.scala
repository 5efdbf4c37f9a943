package graft.ext

import java.sql.Timestamp

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0) =
    new Timestamp(1700000000000L + day * 86400000L + hour * 3600000L)

  test("funnelCounts enforces stage order: a click BEFORE the first view doesn't count") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2: clicked before ever viewing; purchase without a qualifying click
      (2L, ts(0), "click"), (2L, ts(1), "view"), (2L, ts(2), "purchase"),
      // user 3: view then click, no purchase
      (3L, ts(0), "view"), (3L, ts(1), "click"),
      // user 4: only purchases
      (4L, ts(0), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == (3L, 2L, 1L))
  }

  test("same-timestamp stage events qualify (at-or-after semantics)") {
    val events = Seq((1L, ts(0), "view"), (1L, ts(0), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click")).collect().head
    assert((out.getLong(0), out.getLong(1)) == (1L, 1L))
  }

  test("funnelCountsWindowed drops conversions outside the per-stage window") {
    val events = Seq(
      // user 1: every stage within 2h of the previous — full conversion
      (1L, ts(0, 0), "view"), (1L, ts(0, 1), "click"), (1L, ts(0, 2), "purchase"),
      // user 2: click 3 days after view — outside a 1-day window
      (2L, ts(0), "view"), (2L, ts(3), "click"),
      // user 3: click in window, purchase 5 days after the click — outside
      (3L, ts(0), "view"), (3L, ts(0, 2), "click"), (3L, ts(5), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val stages = Seq("view", "click", "purchase")
    val day = 86400000L
    val windowed = Funnel.funnelCountsWindowed(events, "user_id", "ts",
      "event_type", stages, windowMs = day).collect().head
    assert((windowed.getLong(0), windowed.getLong(1), windowed.getLong(2)) == (3L, 2L, 1L))
    // an effectively-unbounded window reproduces the plain funnel
    val unbounded = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
      stages).collect().head
    val wide = Funnel.funnelCountsWindowed(events, "user_id", "ts", "event_type",
      stages, windowMs = 1000L * day).collect().head
    assert((wide.getLong(0), wide.getLong(1), wide.getLong(2)) ==
      (unbounded.getLong(0), unbounded.getLong(1), unbounded.getLong(2)))
  }

  test("cohortRetention counts each user once per active week, offset from first week") {
    val events = Seq(
      // user 1: first seen week 0 (day 0 = a fixed epoch), active weeks 0 and 1
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(8), "view"),
      // user 2: same cohort week, only active week 0
      (2L, ts(2), "view"),
      // user 3: cohort one week later
      (3L, ts(9), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.cohortRetention(events, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val cohorts = out.keys.map(_._1).toSeq.distinct.sorted
    assert(cohorts.size == 2)
    val (c0, c1) = (cohorts.head, cohorts.last)
    assert(out((c0, 0L)) == 2) // users 1 and 2 active in their cohort week
    assert(out((c0, 1L)) == 1) // only user 1 returned the next week
    assert(out((c1, 0L)) == 1) // user 3's cohort
    assert(out.size == 3)
  }
}
