package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  test("poissonWeight: ladder reproduces Poisson(1) masses over a uniform grid") {
    val n = 100000
    val grid = (0 until n).map(i => i.toDouble / n).toDF("u")
    val counts = grid.select(Bootstrap.poissonWeight(col("u")).as("w"))
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = math.exp(-1.0)
    val expect = Seq(e, e, e / 2, e / 6, e / 24, e / 120)
    expect.zipWithIndex.foreach { case (p, k) =>
      val got = counts.getOrElse(k.toLong, 0L).toDouble / n
      assert(math.abs(got - p) < 2e-3, s"P(w=$k): $got vs $p")
    }
  }

  test("groupMeanCi: interval brackets the true mean and is reproducible") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 2000L).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val base = if (g == "a") 100.0 else 50.0
      (g, base + rnd.nextGaussian() * 10, i)
    }
    val df = rows.toDF("g", "v", "id")
    def run() = Bootstrap.groupMeanCi(df, Seq("g"), "v", "id", reps = 50)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val out = run()
    assert(out.keySet == Set("a", "b"))
    for ((g, (n, mean, lo, hi)) <- out) {
      assert(n == 1000L)
      assert(lo < mean && mean < hi, s"$g: $lo !< $mean !< $hi")
      // σ=10, n=1000 → se ≈ 0.32; the 95% band should be a few se wide
      assert(hi - lo > 0.5 && hi - lo < 3.0, s"$g width ${hi - lo}")
    }
    assert(math.abs(out("a")._2 - 100.0) < 2.0)
    // deterministic resampling: identical output on a re-run
    assert(run() == out)
  }

  test("groupMeanCi: a group with huge variance gets a wider interval") {
    val rnd = new scala.util.Random(9)
    val rows = (1L to 1000L).map { i =>
      val g = if (i % 2 == 0) "tight" else "wild"
      val v = if (g == "tight") 10.0 + rnd.nextGaussian()
              else 10.0 + rnd.nextGaussian() * 100
      (g, v, i)
    }
    val out = Bootstrap.groupMeanCi(rows.toDF("g", "v", "id"),
        Seq("g"), "v", "id", reps = 50)
      .collect().map(r => r.getString(0) -> (r.getDouble(4) - r.getDouble(3)))
      .toMap
    assert(out("wild") > 10 * out("tight"),
      s"wild ${out("wild")} should dwarf tight ${out("tight")}")
  }
}
