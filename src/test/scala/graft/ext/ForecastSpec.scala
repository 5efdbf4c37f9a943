package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ForecastSpec extends SparkTestBase {
  import spark.implicits._

  private def daily(rows: Seq[(String, String, Double)]) =
    rows.toDF("g", "d", "x")
      .select(col("g"), col("d").cast("date").as("d"),
        col("x").cast("decimal(18,6)").as("x"))

  test("holtLinear: a perfectly linear series is tracked exactly — zero " +
    "MAE, trend = slope, forecast = next point") {
    // x_t = 10t: l2=20, b2=10 → forecast f3=30=x3 → error 0 and the state
    // stays (l=10t, b=10) forever
    val rows = (1 to 8).map(i => ("lin", f"2024-01-0$i", 10.0 * i))
    val out = Forecast.holtLinear(daily(rows), "g", "d", "x").collect().head
    assert(out.getLong(1) == 8)
    assert(out.getDouble(2) == 80.0)  // level = x_8
    assert(out.getDouble(3) == 10.0)  // trend = slope
    assert(out.getDouble(4) == 90.0)  // forecast_next = x_9
    assert(out.getDouble(5) == 0.0)   // mae
  }

  test("holtLinear: matches an inline reference fold on an arbitrary series " +
    "and drops groups with < 3 days") {
    val xs = Seq(5.0, 9.0, 2.0, 14.0, 8.0, 11.0, 3.0)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      ("s", f"2024-02-0${i + 1}", x)
    } ++ Seq(("tiny", "2024-02-01", 1.0), ("tiny", "2024-02-02", 2.0))
    val out = Forecast.holtLinear(daily(rows), "g", "d", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("tiny"), "groups with < 3 days are dropped")
    // reference fold, same operation order
    var l = xs(1); var b = xs(1) - xs(0); var sae = 0.0
    xs.drop(2).foreach { x =>
      val f = l + b
      sae += math.abs(x - f)
      val lNew = 0.5 * x + 0.5 * f
      b = 0.25 * (lNew - l) + 0.75 * b
      l = lNew
    }
    val r = out("s")
    assert(r.getDouble(2) == l && r.getDouble(3) == b)
    assert(r.getDouble(4) == l + b)
    assert(r.getDouble(5) == sae / (xs.length - 2))
  }

  test("holtLinear: a level shift pulls the forecast toward the new level " +
    "within a few days") {
    val rows = (1 to 10).map(i => ("sh", f"2024-03-$i%02d", 100.0)) ++
      (11 to 16).map(i => ("sh", f"2024-03-$i%02d", 200.0))
    val out = Forecast.holtLinear(daily(rows), "g", "d", "x").collect().head
    assert(out.getDouble(4) > 180.0,
      s"forecast should approach the new level: ${out.getDouble(4)}")
  }
}
