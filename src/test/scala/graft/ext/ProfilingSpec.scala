package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("alpha"), 10),
    (2L, Some("beta"), 10),
    (3L, None, 20),
    (4L, Some("alpha"), 30)
  ).toDF("id", "name", "score")

  test("profileColumns: rows, nulls, exact distincts, string-cast min/max") {
    val out = Profiling.profileColumns(df, Seq("id", "name", "score"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out("id") == ((4L, 0L, 4L, "1", "4")))
    assert(out("name") == ((4L, 1L, 2L, "alpha", "beta"))) // null excluded from distinct
    assert(out("score") == ((4L, 0L, 3L, "10", "30")))
  }

  test("profileColumns approx mode: distinct within HLL tolerance, no Expand") {
    val big = (0 until 5000).map(i => (i.toLong, s"v${i % 997}")).toDF("id", "v")
    val out = Profiling.profileColumns(big, Seq("id", "v"), exactDistinct = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // default HLL rsd is 0.05 → allow 2σ
    assert(math.abs(out("id") - 5000L) <= 5000 * 0.10)
    assert(math.abs(out("v") - 997L) <= 997 * 0.10)
    val plan = Profiling.profileColumns(big, Seq("id", "v"), exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx mode must not Expand:\n${plan.take(800)}")
  }

  test("madOutliers: flags the planted outlier, robust to its magnitude") {
    // 99 values uniform-ish around 100 plus one at 10000: median/MAD barely
    // move, the planted point gets a huge modified z
    val vals = (1 to 99).map(i => (i.toLong, 95.0 + (i % 11))) :+ (100L, 10000.0)
    val out = Profiling.madOutliers(vals.toDF("id", "v"), "id", "v")
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(100L))
    val z = out.head.getAs[Double]("robust_z")
    assert(z > 100, s"z=$z")
  }

  test("madOutliers: symmetric data flags nothing") {
    val vals = (1 to 100).map(i => (i.toLong, (i % 10).toDouble))
    assert(Profiling.madOutliers(vals.toDF("id", "v"), "id", "v").count() == 0)
  }

  test("madOutliers: approx mode agrees with exact on the planted outlier") {
    val vals = (1 to 999).map(i => (i.toLong, 50.0 + (i % 7))) :+ (1000L, -4000.0)
    val exact = Profiling.madOutliers(vals.toDF("id", "v"), "id", "v")
      .collect().map(_.getLong(0)).toSet
    val approxM = Profiling.madOutliers(vals.toDF("id", "v"), "id", "v",
        exact = false)
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(1000L) && approxM == Set(1000L))
  }

  test("benfordAudit: a perfectly Benford sample has ~zero chi2, a uniform " +
    "first-digit sample does not") {
    // 'perfect' sample: digit d appears round(1000*log10(1+1/d)) times
    val benford = (1 to 9).flatMap { d =>
      val n = math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt
      Seq.fill(n)(d * 10.0 + 1.0) // first digit = d, magnitude > 1
    }
    val b = Profiling.benfordAudit(benford.toDF("v"), "v")
      .orderBy(col("digit")).collect()
    assert(b.length == 9)
    assert(b.map(_.getInt(0)).toSeq == (1 to 9))
    assert(b.head.getDouble(3) < 1.0, s"near-Benford chi2: ${b.head.getDouble(3)}")
    assert(b.forall(_.getLong(4) == 8L))
    // monotone: digit 1 most frequent
    assert(b.head.getLong(1) > b.last.getLong(1))
    val uniform = (1 to 9).flatMap(d => Seq.fill(100)(d * 100.0 + 5.0))
    val u = Profiling.benfordAudit(uniform.toDF("v"), "v").collect()
    assert(u.head.getDouble(3) > 50.0, s"uniform chi2: ${u.head.getDouble(3)}")
  }

  test("benfordAudit: sub-1 values are excluded and empty digits keep their " +
    "expected mass") {
    // only digits 1 and 2 present; 0.5 rows dropped
    val df = Seq(1.5, 12.0, 150.0, 2.5, 0.5, 0.9).toDF("v")
    val out = Profiling.benfordAudit(df, "v").orderBy(col("digit")).collect()
    assert(out.map(_.getLong(1)).sum == 4L) // 0.5/0.9 excluded
    assert(out.length == 9) // spine keeps digits 3..9 with n_obs = 0
    assert(out.drop(2).forall(_.getLong(1) == 0L))
    assert(out.forall(_.getDouble(2) > 0.0)) // expected mass everywhere
  }

  test("shrunkRates: small samples are pulled to the pool and re-ranked") {
    // brand X: 2/2 raw 1.0 (tiny sample); Y: 900/1000 raw 0.9; Z: 100/1000;
    // pooled m = 1002/2002 ~ 0.5005. With tau=200 X collapses to ~0.505 and
    // drops below Y (~0.833) in the shrunk ranking - the raw-rank deception
    // the operator exists to surface.
    val rows = Seq.fill(2)(("X", true)) ++
      Seq.fill(900)(("Y", true)) ++ Seq.fill(100)(("Y", false)) ++
      Seq.fill(100)(("Z", true)) ++ Seq.fill(900)(("Z", false))
    val out = Profiling.shrunkRates(rows.toDF("g", "s"), "g", "s", tau = 200.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getInt(5), r.getInt(6))).toMap
    val (nx, kx, rawX, shrX, rankRawX, rankShrX) = out("X")
    val (_, _, _, shrY, rankRawY, rankShrY) = out("Y")
    assert(nx == 2 && kx == 2 && rawX == 1.0)
    val m = 1002.0 / 2002
    assert(math.abs(shrX - (2 + m * 200) / (2 + 200)) < 1e-6)
    assert(shrX < shrY)
    assert(rankRawX == 1 && rankRawY == 2 && rankShrY == 1 && rankShrX == 2)
  }

  test("shrunkRates: tau=0 degenerates to raw rates and identical rankings") {
    val rows = Seq(("a", true), ("a", false), ("b", true))
    val out = Profiling.shrunkRates(rows.toDF("g", "s"), "g", "s", tau = 0.0)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getInt(7)))
    out.foreach { case (_, raw, shrunk, shift) =>
      assert(raw == shrunk && shift == 0)
    }
  }

  test("winsorizedMean: hand-computed 10% clamp — one row each side " +
    "replaced by the boundary order statistics") {
    import spark.implicits._
    // values 1..10: n=10, k=1 → lo=2, hi=9; winsorized sum =
    // 2+2+3+...+8+9+9 = 55 → mean 5.5 (symmetric clamp cancels here)
    val df = (1L to 10L).map(v => ("g", v, v)).toDF("g", "v", "id")
    val out = Profiling.winsorizedMean(df, "g", "v", "id").collect().head
    assert(out.getLong(1) == 10)
    assert(out.getLong(2) == 2L && out.getLong(3) == 9L)
    assert(out.getDouble(4) == 5.5)
  }

  test("winsorizedMean: a wild outlier is clamped to the boundary order " +
    "statistic — n stays intact and the mean stays at the clean level") {
    import spark.implicits._
    // 1..9 plus 1000000: raw mean ≈ 100000.9; winsorized: 1→2, 1e6→9,
    // sum = 46 + 9 = 55 → mean 5.5
    val dirty = ((1L to 9L) :+ 1000000L).map(v => ("g", v, v))
    val out = Profiling.winsorizedMean(dirty.toDF("g", "v", "id"),
      "g", "v", "id").collect().head
    assert(out.getLong(1) == 10) // nothing dropped
    assert(out.getDouble(4) == 5.5)
  }

  test("winsorizedMean: k = 0 (n < pctDen) degenerates to the plain mean") {
    import spark.implicits._
    val df = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 90L, 3L))
      .toDF("g", "v", "id")
    val out = Profiling.winsorizedMean(df, "g", "v", "id").collect().head
    assert(out.getDouble(4) == 40.0)
  }

  test("weightedMedian: weight concentration moves the median to the " +
    "typical UNIT, not the typical row") {
    import spark.implicits._
    // values 1..5, weight 1 each except value 5 carries weight 10:
    // plain median = 3, total weight 14, half = 7 → cum reaches 7 at value 5
    val rows = Seq(("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 3L, 1L, 3L),
      ("g", 4L, 1L, 4L), ("g", 5L, 10L, 5L))
    val out = Profiling.weightedMedian(rows.toDF("g", "v", "w", "id"),
      "g", "v", "w", "id").collect().head
    assert(out.getLong(1) == 5 && out.getLong(2) == 14L)
    assert(out.getLong(3) == 5L)
  }

  test("weightedMedian: uniform weights reduce to the lower median, and " +
    "the 2·cumw ≥ W boundary is exact at even totals") {
    import spark.implicits._
    // 4 values weight 1: W=4, rule 2·cumw ≥ 4 first holds at cumw=2 → v=2
    val rows = (1L to 4L).map(v => ("g", v, 1L, v))
    val out = Profiling.weightedMedian(rows.toDF("g", "v", "w", "id"),
      "g", "v", "w", "id").collect().head
    assert(out.getLong(3) == 2L)
  }
}
