package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("acf: alternating series is exactly -1 at lag 1 and +1 at lag 2") {
    // x alternates 10, 20: lag-1 pairs lie on y = 30 - x (r = -1 exactly),
    // lag-2 pairs on y = x (r = +1 exactly) — both exact in the moment math
    val d = (0 until 10).map { i =>
      (f"2024-01-${i + 1}%02d", if (i % 2 == 0) 10.0 else 20.0)
    }.toDF("ds", "x").select(to_date(col("ds")).as("day"), col("x"))
    val out = Series.acf(d, "day", "x", maxLag = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 9 && approx(out(1L)._2, -1.0, 1e-12))
    assert(out(2L)._1 == 8 && approx(out(2L)._2, 1.0, 1e-12))
    assert(approx(out(3L)._2, -1.0, 1e-12))
  }

  test("acf: gaps align by calendar day, not row order") {
    // days 1,2,4: lag 1 aligns only (2,1); lag 2 aligns only (4,2);
    // lag 3 aligns only (4,1) — single pairs have zero variance → null acf
    val d = Seq(("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-04", 4.0))
      .toDF("ds", "x").select(to_date(col("ds")).as("day"), col("x"))
    val out = Series.acf(d, "day", "x", maxLag = 3).collect()
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(out.forall(_.isNullAt(2)))
  }

  test("ljungBox: Q matches the hand fold over the operator's own ACF, and " +
    "a strongly periodic series rejects whiteness") {
    import spark.implicits._
    // 40-day alternating series — lag-1 ACF ≈ -1, lag-2 ≈ +1, ... → huge Q
    val rows = (1 to 40).map(i => (f"2024-01-01", i, if (i % 2 == 0) 10.0 else -10.0))
    val d = rows.map { case (_, i, v) => (i, v) }
      .toDF("i", "x")
      .select(expr("date_add(DATE '2024-01-01', i - 1)").as("day"), col("x"))
    val out = Series.ljungBox(d, "day", "x", maxLag = 5).collect().head
    assert(out.getLong(0) == 40 && out.getLong(1) == 5)
    // recompute Q from the acf operator directly
    val rho = Series.acf(d, "day", "x", maxLag = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val qHand = 40.0 * 42.0 * (1 to 5).map { k =>
      BigDecimal(rho(k.toLong) * rho(k.toLong) / (40 - k))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(approx(out.getDouble(2), qHand, 1e-4))
    assert(out.getBoolean(4), "periodic series must reject whiteness")
  }

  test("crossCorrelation: a shifted copy peaks exactly at its lag with " +
    "xcorr 1, and lag 0 of a series with itself is 1") {
    import spark.implicits._
    // y(d) = x(d - 2): x LEADS y by 2 → peak at lag +2
    val xs = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0, 6.0, 2.5)
    def mk(vals: Seq[Double], startDay: Int) =
      vals.zipWithIndex.map { case (v, i) => (startDay + i, v) }
        .toDF("i", "v")
        .select(expr("date_add(DATE '2024-01-01', i - 1)").as("day"),
          // the operator contract wants integer-valued decimals (micro-unit
          // convention); correlation is scale-invariant
          (col("v") * 1000).cast("decimal(19,0)").as("v"))
    val a = mk(xs, 1)
    val b = mk(xs, 3) // same values, two days later
    val out = Series.crossCorrelation(a, b, "day", "v", "v", maxLag = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) == 1.0, s"peak at lag +2: $out")
    assert(out.filterNot(_._1 == 2L).values.forall(_ < 1.0))
    val self = Series.crossCorrelation(a, a, "day", "v", "v", maxLag = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(self(0L) == 1.0)
  }

  test("peaks: strict local maxima with prominence; edges and plateaus are " +
    "not peaks") {
    import spark.implicits._
    // values: 5, 9, 3, 7, 7, 2, 8  → peaks: day2 (9, prom 4); the 7-plateau
    // is NOT a peak (not strict); day7's 8 is an edge
    val vals = Seq(5L, 9L, 3L, 7L, 7L, 2L, 8L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("s", f"2024-01-0${i + 1}", v)
    }
    val df = rows.toDF("g", "d", "v")
      .select(col("g"), col("d").cast("date").as("d"),
        col("v").cast("decimal(38,0)").as("v"))
    val out = Series.peaks(df, "g", "d", "v").collect()
    assert(out.length == 1)
    assert(out.head.getDate(1).toString == "2024-01-02")
    assert(out.head.getDouble(2) == 9.0 && out.head.getDouble(3) == 4.0)
  }

  test("ljungBox: a linear (trend-only, zero-residual-structure) series " +
    "still rejects but a tiny-lag Q is finite and positive") {
    import spark.implicits._
    val d = (1 to 30).map(i => (i, i.toDouble))
      .toDF("i", "x")
      .select(expr("date_add(DATE '2024-01-01', i - 1)").as("day"), col("x"))
    val out = Series.ljungBox(d, "day", "x", maxLag = 3).collect().head
    assert(out.getDouble(2) > 0.0 && !out.getDouble(2).isNaN)
  }
}
