package graft.ext

import java.sql.Timestamp

import graft.SparkTestBase

class EventWindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("sessionize splits on gaps > 30 min, per user") {
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 1.0), (1L, ts(20), 1.0), // session 1
      (1L, ts(60), 1.0), (1L, ts(70), 1.0), // session 2 (40-min gap)
      (2L, ts(5), 1.0) // other user, own session
    ).toDF("user_id", "ts", "value")
    val out = EventWindows.sessionize(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5))).toMap
    assert(out((1L, 1L)) == (3L, 20 * 60000L))
    assert(out((1L, 2L)) == (2L, 10 * 60000L))
    assert(out((2L, 1L)) == (1L, 0L))
  }

  test("sessionizeChunked matches plain sessionize, incl. sessions spanning chunk boundaries") {
    // dominant "bot" user: an event every 10 min for 3 days straight (one session
    // spanning every day boundary), plus sparse users with gaps around midnight
    val bot = (0 until (3 * 24 * 6)).map(i => (99L, ts(i * 10), 1.0))
    val sparse = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 1.0), (1L, ts(60), 1.0), // gap-split sessions
      // user 2: events straddling the first midnight (1700000000000 is mid-day UTC;
      // minutes 650-700 cross into the next day at some chunking) 20 min apart → one session
      (2L, ts(650), 1.0), (2L, ts(670), 1.0), (2L, ts(690), 1.0), (2L, ts(710), 1.0),
      // user 3: a >30-min gap exactly across a day boundary → two sessions
      (3L, ts(600), 1.0), (3L, ts(900), 1.0)
    )
    val df = (bot ++ sparse).toDF("user_id", "ts", "value")
    def canon(d: org.apache.spark.sql.DataFrame) = d
      .select("user_id", "session_id", "n_events", "start_ms", "end_ms", "duration_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2)).toSeq
    val plain = canon(EventWindows.sessionize(df))
    val chunkedDay = canon(EventWindows.sessionizeChunked(df, chunk = "day"))
    val chunkedHour = canon(EventWindows.sessionizeChunked(df, chunk = "hour"))
    assert(chunkedDay == plain)
    assert(chunkedHour == plain)
    // the bot's 3-day run must have merged into a single session
    assert(plain.count(_._1 == 99L) == 1)
  }

  test("hourlyStats buckets by hour and type") {
    val h0 = new Timestamp(3600L * 1000 * 500000)
    val df = Seq(
      (h0, "click", 1.0), (new Timestamp(h0.getTime + 100000), "click", 2.0),
      (new Timestamp(h0.getTime + 3600000), "click", 5.0)
    ).toDF("ts", "event_type", "value")
    val out = EventWindows.hourlyStats(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(3600L * 500000) == (2L, 3.0))
    assert(out(3600L * 500001) == (1L, 5.0))
  }

  test("slidingStats: events land in overlapping windows") {
    val h0 = new Timestamp(3600L * 1000 * 500000)
    val df = Seq((h0, "click", 1.0)).toDF("ts", "event_type", "value")
    val out = EventWindows.slidingStats(df, "1 hour", "30 minutes").collect()
    assert(out.length == 2) // one event → 2 overlapping hour windows at 30-min slide
    assert(out.map(_.getLong(0)).toSet ==
      Set(3600L * 500000, 3600L * 500000 - 1800))
  }

  test("coverageOverTime: per-hour distinct items vs catalog") {
    val h0 = new Timestamp(3600L * 1000 * 500000)
    val events = Seq((h0, 1L), (h0, 1L), (h0, 2L),
      (new Timestamp(h0.getTime + 3600000), 3L)).toDF("ts", "item_id")
    val catalog = Seq(1L, 2L, 3L, 4L).toDF("id")
    val out = EventWindows.coverageOverTime(events, catalog, "item_id", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(approx(out(3600L * 500000), 0.5))
    assert(approx(out(3600L * 500001), 0.25))
  }

  test("propsStats extracts k and aggregates; missing k → null-skipped") {
    val df = Seq(
      ("click", "{\"k\": 10}"), ("click", "{\"k\": 20}"), ("click", "{}"),
      ("view", "{\"k\": 7}")
    ).toDF("event_type", "props")
    val out = EventWindows.propsStats(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("click") == (2L, 30L))
    assert(out("view") == (1L, 7L))
  }

  test("topSessionPaths: gap splits sessions, order within session is by time") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val df = Seq(
      // user 1, session 1: view > click (1 min apart)
      (1L, 1L, 0L, "view"), (1L, 2L, 60000L, "click"),
      // user 1, session 2 (2h later): view > click
      (1L, 3L, 7200000L, "view"), (1L, 4L, 7260000L, "click"),
      // user 2, one session: purchase only
      (2L, 5L, 0L, "purchase")
    ).map { case (u, e, off, t) =>
      (u, e, new java.sql.Timestamp(base + off), t)
    }.toDF("user_id", "event_id", "ts", "event_type")
    val out = EventWindows.topSessionPaths(df, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("view>click" -> 2L, "purchase" -> 1L))
  }

  test("topSessionPaths: topN cut keeps the most frequent path") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val df = (1 to 3).flatMap(u => Seq((u.toLong, u * 10L, 0L, "view"))) ++
      Seq((9L, 99L, 0L, "click"))
    val out = EventWindows.topSessionPaths(
        df.map { case (u, e, off, t) =>
          (u, e, new java.sql.Timestamp(base + off), t)
        }.toDF("user_id", "event_id", "ts", "event_type"), topN = 1)
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "view" &&
      out.head.getLong(1) == 3L)
  }
}
