package graft.ext

import graft.SparkTestBase

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
}
