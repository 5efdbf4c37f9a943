package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ChangeDetectSpec extends SparkTestBase {
  import spark.implicits._

  private def daily(rows: Seq[(String, String, Long)]) =
    rows.toDF("g", "d", "v")
      .select(col("g"), col("d").cast("date").as("d"),
        col("v").cast("decimal(38,0)").as("v"))

  test("cusum: a planted level shift alarms and peaks at the end of the run") {
    // 10 quiet days at 100 then 5 shifted days at 200: s climbs through the
    // shift, max at the last day, alarms once s crosses h
    val rows = (1 to 10).map(i => ("a", f"2024-01-$i%02d", 100L)) ++
      (11 to 15).map(i => ("a", f"2024-01-$i%02d", 200L))
    val out = ChangeDetect.cusum(daily(rows), "g", "d", "v", k = 0.5, h = 2.0)
      .collect().head
    assert(out.getLong(1) == 15)
    assert(out.getDouble(2) > 2.0)
    assert(out.getDate(3).toString == "2024-01-15")
    assert(out.getLong(4) >= 1 && out.getLong(4) <= 5)
  }

  test("cusum: a flat series never alarms and reports a null peak") {
    val rows = (1 to 12).map(i => ("flat", f"2024-02-$i%02d", 500L))
    val out = ChangeDetect.cusum(daily(rows), "g", "d", "v", k = 0.5, h = 2.0)
      .collect().head
    // sd = 0 → z = 0 via the guard; s stays 0, no peak day
    assert(out.getDouble(2) == 0.0 && out.isNullAt(3) && out.getLong(4) == 0)
  }

  test("cusum: groups fold independently and a downward shift stays silent " +
    "in the one-sided statistic") {
    val up = (1 to 8).map(i => ("up", f"2024-03-$i%02d", 10L)) ++
      (9 to 12).map(i => ("up", f"2024-03-$i%02d", 40L))
    val down = (1 to 8).map(i => ("down", f"2024-03-$i%02d", 40L)) ++
      (9 to 12).map(i => ("down", f"2024-03-$i%02d", 10L))
    val out = ChangeDetect
      .cusum(daily(up ++ down), "g", "d", "v", k = 0.5, h = 2.5)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getLong(4)))
      .toMap
    assert(out("up")._2 >= 1, s"upward shift should alarm: $out")
    // the early high plateau gives positive z at the START for `down`, but
    // the post-shift tail drifts to zero — its peak cannot exceed `up`'s
    assert(out("down")._1 <= out("up")._1)
  }

  test("mannKendall: strictly increasing series has S = n(n-1)/2 and " +
    "flags an increasing trend; strictly decreasing mirrors it") {
    val up = (1 to 5).map(i => ("up", f"2024-01-0$i", 10L * i))
    val down = (1 to 5).map(i => ("down", f"2024-01-0$i", 100L - 10L * i))
    val out = ChangeDetect.mannKendall(daily(up ++ down), "g", "d", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getString(5))).toMap
    // n=5, no ties: S = 10, Var = 5·4·15/18 = 16.666667,
    // z = 9/sqrt(16.666667) = 2.204541 > 1.96
    assert(out("up")._1 == 5 && out("up")._2 == 10L)
    assert(approx(out("up")._3, 16.666667, 1e-6))
    assert(approx(out("up")._4, 2.204541, 1e-6))
    assert(out("up")._5 == "increasing")
    assert(out("down")._2 == -10L && out("down")._5 == "decreasing")
    assert(approx(out("down")._4, -2.204541, 1e-6))
  }

  test("mannKendall: constant series has S = 0, z = 0, no trend, and the " +
    "tie correction zeroes the variance") {
    val rows = (1 to 6).map(i => ("c", f"2024-01-0$i", 42L))
    val out = ChangeDetect.mannKendall(daily(rows), "g", "d", "v")
      .collect().head
    // one tie group of t=6: Var = (6·5·17 − 6·5·17)/18 = 0
    assert(out.getLong(2) == 0L)
    assert(out.getDouble(3) == 0.0)
    assert(out.getDouble(4) == 0.0)
    assert(out.getString(5) == "none")
  }

  test("bestSplit finds a planted level shift at the exact boundary with " +
    "exact segment means") {
    // 10 days at 100 then 5 at 200 → best split after day 10
    val rows = (1 to 10).map(i => ("a", f"2024-01-$i%02d", 100L)) ++
      (11 to 15).map(i => ("a", f"2024-01-$i%02d", 200L))
    val out = ChangeDetect.bestSplit(daily(rows), "g", "d", "v")
      .collect().head
    assert(out.getLong(1) == 15)
    assert(out.getDate(2).toString == "2024-01-10")
    assert(out.getLong(3) == 10L)
    assert(out.getDouble(4) == 100.0 && out.getDouble(5) == 200.0)
    assert(out.getDouble(6) == 100.0)
  }

  test("bestSplit: on a constant series every split scores equally — the " +
    "earliest day wins deterministically") {
    val rows = (1 to 6).map(i => ("c", f"2024-02-0$i", 42L))
    val out = ChangeDetect.bestSplit(daily(rows), "g", "d", "v")
      .collect().head
    assert(out.getDate(2).toString == "2024-02-01")
    assert(out.getDouble(6) == 0.0)
  }
}
