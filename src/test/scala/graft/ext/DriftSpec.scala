package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  // -------------------------------------------------------------------- KS

  test("ksOneVsRest: hand-computed two-group statistic") {
    // g1: values 1,1,2  g2: values 2,3,3
    // CDF_g1: 1->2/3, 2->1, 3->1 ; CDF_g2: 1->0, 2->1/3, 3->1
    // sup diff = |2/3 - 0| = 2/3 at x=1 (both directions symmetric here)
    val df = Seq(("g1", 1), ("g1", 1), ("g1", 2), ("g2", 2), ("g2", 3), ("g2", 3))
      .toDF("g", "v")
    val r = Drift.ksOneVsRest(df, "g", "v")
      .orderBy(col("s")).collect()
    assert(r.length == 2)
    assert(r.map(_.getLong(1)).toSeq == Seq(3L, 3L))
    r.foreach(row => assert(math.abs(row.getDouble(2) - 2.0 / 3) < 1e-6))
  }

  test("ksOneVsRest: identical distributions give zero") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2), ("b", 3))
      .toDF("g", "v")
    val r = Drift.ksOneVsRest(df, "g", "v").collect()
    r.foreach(row => assert(row.getDouble(2) == 0.0))
  }

  test("ksOneVsRest: evaluates the CDF gap at points ABSENT from one group") {
    // g1 = {1, 3}, g2 = {2, 4}: the largest gap (at x=1 and x=3, 0.5) is only
    // visible at support points of the OTHER group too — the pooled-support
    // cross is what makes the statistic exact rather than group-local.
    val df = Seq(("g1", 1), ("g1", 3), ("g2", 2), ("g2", 4)).toDF("g", "v")
    val r = Drift.ksOneVsRest(df, "g", "v").collect()
    r.foreach(row => assert(math.abs(row.getDouble(2) - 0.5) < 1e-6))
  }

  // ----------------------------------------------------------- Wasserstein-1

  test("wasserstein1OneVsRest: hand-computed transport distance") {
    // g1 = {1,2}, g2 = {3,4}: W1 = |mean transport| = 2 exactly
    // (gap .5 at x=1, 1 at x=2, .5 at x=3, each dx=1)
    val df = Seq(("g1", 1), ("g1", 2), ("g2", 3), ("g2", 4)).toDF("g", "v")
    val r = Drift.wasserstein1OneVsRest(df, "g", "v").collect()
    r.foreach(row => assert(math.abs(row.getDouble(2) - 2.0) < 1e-9))
  }

  test("wasserstein1OneVsRest: unit shift gives W1 = 1, identical gives 0") {
    val shifted = Seq(("g1", 1), ("g1", 2), ("g2", 2), ("g2", 3)).toDF("g", "v")
    Drift.wasserstein1OneVsRest(shifted, "g", "v").collect()
      .foreach(row => assert(math.abs(row.getDouble(2) - 1.0) < 1e-9))
    val same = Seq(("a", 1), ("a", 5), ("b", 1), ("b", 5)).toDF("g", "v")
    Drift.wasserstein1OneVsRest(same, "g", "v").collect()
      .foreach(row => assert(row.getDouble(2) == 0.0))
  }

  test("wasserstein1OneVsRest: respects uneven support gaps (dx weighting)") {
    // g1 = {0}, g2 = {10}: single gap of 10 with CDF gap 1 -> W1 = 10
    val df = Seq(("g1", 0), ("g2", 10)).toDF("g", "v")
    Drift.wasserstein1OneVsRest(df, "g", "v").collect()
      .foreach(row => assert(math.abs(row.getDouble(2) - 10.0) < 1e-9))
  }

  // ------------------------------------------------------------- Mann–Whitney

  test("mannWhitneyOneVsRest: hand-computed U without ties") {
    // g1 = {1,2}, g2 = {3,4}: ranks 1,2 vs 3,4.
    // U_g1 = R1 - n1(n1+1)/2 = 3 - 3 = 0 ; U_g2 = 7 - 3 = 4 = n1*n2 - U_g1.
    val df = Seq(("g1", 1), ("g1", 2), ("g2", 3), ("g2", 4)).toDF("g", "v")
    val r = Drift.mannWhitneyOneVsRest(df, "g", "v")
      .orderBy(col("src")).collect()
    assert(r(0).getDouble(2) == 0.0)
    assert(r(1).getDouble(2) == 4.0)
    // complete separation: z symmetric, negative for the low group
    assert(r(0).getDouble(3) < 0 && r(1).getDouble(3) > 0)
    assert(math.abs(r(0).getDouble(3) + r(1).getDouble(3)) < 1e-9)
  }

  test("mannWhitneyOneVsRest: tie-averaged ranks are exact half-integers") {
    // g1 = {1,2}, g2 = {2,3}: value 2 is shared -> avg rank 2.5.
    // R_g1 = 1 + 2.5 = 3.5, U_g1 = 3.5 - 3 = 0.5
    val df = Seq(("g1", 1), ("g1", 2), ("g2", 2), ("g2", 3)).toDF("g", "v")
    val r = Drift.mannWhitneyOneVsRest(df, "g", "v")
      .orderBy(col("src")).collect()
    assert(r(0).getDouble(2) == 0.5)
    assert(r(1).getDouble(2) == 3.5)
  }

  test("mannWhitneyOneVsRest: identical distributions give U = n1*n2/2, z = 0") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2), ("b", 3))
      .toDF("g", "v")
    val r = Drift.mannWhitneyOneVsRest(df, "g", "v").collect()
    r.foreach { row =>
      assert(row.getDouble(2) == 4.5) // 3*3/2
      assert(math.abs(row.getDouble(3)) < 1e-9)
    }
  }

  test("mannWhitneyOneVsRest: all-tied data yields null z (zero variance)") {
    val df = Seq(("a", 7), ("a", 7), ("b", 7), ("b", 7)).toDF("g", "v")
    val r = Drift.mannWhitneyOneVsRest(df, "g", "v").collect()
    r.foreach(row => assert(row.isNullAt(3)))
  }

  // ------------------------------------------------------------------- PSI

  test("psi: identical slices give exactly zero terms") {
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val r = Drift.psi(a, a, "v", nBins = 5).orderBy(col("bin")).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getDouble(3) == 0.0 && row.getDouble(4) == 0.0)
    }
  }

  test("psi: shifted distribution is flagged and out-of-range values clamp") {
    // ref on [0,10); cur entirely above the ref max -> all cur mass clamps
    // into the top bin and the PSI total is large.
    val ref = (0 until 100).map(i => i % 10 * 1.0).toDF("v")
    val cur = (0 until 100).map(_ => 99.0).toDF("v")
    val r = Drift.psi(ref, cur, "v", nBins = 10).orderBy(col("bin")).collect()
    val top = r.last
    assert(top.getInt(0) == 9 && top.getLong(2) == 100L)
    assert(r.take(9).forall(_.getLong(2) == 0L))
    assert(top.getDouble(4) > 1.0) // way past the 0.25 action threshold
  }

  test("psi: spine keeps empty bins present with smoothed finite terms") {
    val ref = Seq(0.0, 10.0).toDF("v") // only bins 0 and 9 occupied
    val cur = Seq(0.0, 10.0).toDF("v")
    val r = Drift.psi(ref, cur, "v", nBins = 10).collect()
    assert(r.length == 10)
    assert(r.forall(row => !row.isNullAt(3) && !row.getDouble(3).isNaN))
  }

  // ----------------------------------------------------- categorical dependence

  test("categoricalDependence: independent columns have ~zero MI and chi2") {
    // perfectly balanced 2x2 -> exact independence
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("u", "w")
    val row = Drift.categoricalDependence(df, "u", "w", "p").head()
    assert(row.getLong(1) == 4L)
    assert(math.abs(row.getDouble(4)) < 1e-9) // mi
    assert(math.abs(row.getDouble(5)) < 1e-9) // chi2
    assert(math.abs(row.getDouble(6)) < 1e-9) // v
  }

  test("categoricalDependence: deterministic mapping gives Cramér's V = 1") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"), ("c", "z"))
      .toDF("u", "w")
    val row = Drift.categoricalDependence(df, "u", "w", "p").head()
    assert(math.abs(row.getDouble(6) - 1.0) < 1e-6)
    // MI of a bijection = entropy of the marginal, here H = ln5 - (4/5)ln2...
    // just assert strictly positive and <= ln(3) (level bound)
    assert(row.getDouble(4) > 0.5 && row.getDouble(4) <= math.log(3.0) + 1e-9)
  }

  // --------------------------------------------------------------- grouped OLS

  test("groupedOls: exact line recovered per group") {
    // g1: y = 2x + 1 exactly; g2: y = -0.5x + 3 exactly
    val d1 = Seq.tabulate(5)(i => ("g1", i.toDouble, 2.0 * i + 1))
    val d2 = Seq.tabulate(5)(i => ("g2", i.toDouble, -0.5 * i + 3))
    val r = (d1 ++ d2).toDF("g", "x", "y")
    val rows = Drift.groupedOls(r, "g", "x", "y").orderBy(col("g")).collect()
    assert(math.abs(rows(0).getDouble(2) - 2.0) < 1e-6)
    assert(math.abs(rows(0).getDouble(3) - 1.0) < 1e-6)
    assert(math.abs(rows(1).getDouble(2) + 0.5) < 1e-6)
    assert(math.abs(rows(1).getDouble(3) - 3.0) < 1e-6)
  }

  test("groupedOls: zero x-variance group yields null slope, not a crash") {
    val df = Seq(("g", 1.0, 2.0), ("g", 1.0, 5.0)).toDF("g", "x", "y")
    val row = Drift.groupedOls(df, "g", "x", "y").head()
    assert(row.isNullAt(2) && row.isNullAt(3))
  }

  test("random samples: KS, W1 and U match brute-force references") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val gen: Gen[List[(String, Int)]] = for {
      n <- Gen.choose(10, 80)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("g1", "g2", "g3"),
        Gen.choose(0, 12)))
    } yield rows

    // brute-force references over raw samples, one group vs rest
    def refStats(rows: Seq[(String, Int)], g: String): (Double, Double, Double) = {
      val mine = rows.filter(_._1 == g).map(_._2).sorted
      val rest = rows.filter(_._1 != g).map(_._2).sorted
      val support = rows.map(_._2).distinct.sorted
      def cdf(s: Seq[Int], x: Int) = s.count(_ <= x).toDouble / s.size
      val ks = support.map(x => math.abs(cdf(mine, x) - cdf(rest, x))).max
      val w1 = support.zip(support.tail).map { case (x, nx) =>
        math.abs(cdf(mine, x) - cdf(rest, x)) * (nx - x)
      }.sum
      // U via pairwise comparison (the textbook definition)
      val u = mine.map(a => rest.map(b =>
        if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum).sum
      (ks, w1, u)
    }

    (1L to 8L).foreach { seed =>
      val rows = sample(gen, seed)
      // every group needs at least one row and the pool 2+ distinct values
      val groups = rows.map(_._1).distinct
      val df = rows.toDF("g", "v")
      val ks = Drift.ksOneVsRest(df, "g", "v").collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      val w1 = Drift.wasserstein1OneVsRest(df, "g", "v").collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      val mwu = Drift.mannWhitneyOneVsRest(df, "g", "v").collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      groups.foreach { g =>
        val (rks, rw1, ru) = refStats(rows, g)
        assert(math.abs(ks(g) - rks) < 1e-6, s"seed=$seed g=$g ks")
        assert(math.abs(w1(g) - rw1) < 1e-6, s"seed=$seed g=$g w1")
        assert(math.abs(mwu(g) - ru) < 1e-6, s"seed=$seed g=$g u")
      }
    }
  }

  test("ks and dependence plans aggregate before the metric math") {
    // the shuffle input must be the (group, value) count, not raw rows:
    // no raw-row window partitions — check the KS window reads an Aggregate.
    val df = Seq(("g1", 1), ("g2", 2)).toDF("g", "v")
    val plan = Drift.ksOneVsRest(df, "g", "v").queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"))
    assert(plan.contains("Window"))
  }

  test("ridge2 at lambda = 0 recovers an exact 2-feature linear law with " +
    "r2 = 1; heavy lambda shrinks both coefficients toward 0") {
    import spark.implicits._
    // y = 3·x1 + 5·x2 + 7 exactly, x1/x2 not collinear
    val rows = for (x1 <- 1L to 8L; x2 <- 1L to 5L)
      yield ("g", x1, x2, 3 * x1 + 5 * x2 + 7)
    val df = rows.toDF("g", "x1", "x2", "y")
    val exact = Drift.ridge2(df, "g", "x1", "x2", "y", lambda = 0.0)
      .collect().head
    assert(approx(exact.getDouble(2), 3.0, 1e-9))
    assert(approx(exact.getDouble(3), 5.0, 1e-9))
    assert(approx(exact.getDouble(4), 7.0, 1e-6))
    assert(approx(exact.getDouble(5), 1.0, 1e-9))
    val heavy = Drift.ridge2(df, "g", "x1", "x2", "y", lambda = 1e9)
      .collect().head
    assert(math.abs(heavy.getDouble(2)) < 0.01 &&
      math.abs(heavy.getDouble(3)) < 0.01)
  }

  test("ridge2: collinear features are singular at lambda = 0 (null " +
    "coefficients) but solvable under regularization") {
    import spark.implicits._
    // x2 = 2·x1 exactly — the OLS normal equations are singular
    val rows = (1L to 20L).map(x => ("g", x, 2 * x, 10 * x))
    val df = rows.toDF("g", "x1", "x2", "y")
    val ols = Drift.ridge2(df, "g", "x1", "x2", "y", lambda = 0.0)
      .collect().head
    assert(ols.isNullAt(2) && ols.isNullAt(3))
    val ridge = Drift.ridge2(df, "g", "x1", "x2", "y", lambda = 10.0)
      .collect().head
    // ridge splits the effect across the collinear pair: both finite, and
    // the implied fit b1 + 2·b2 ≈ 10
    assert(!ridge.isNullAt(2) && !ridge.isNullAt(3))
    assert(math.abs(ridge.getDouble(2) + 2 * ridge.getDouble(3) - 10.0) < 0.5)
  }
}
