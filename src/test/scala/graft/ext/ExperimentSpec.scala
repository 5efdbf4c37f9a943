package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkTestBase {
  import spark.implicits._

  test("cuped: perfect covariate removes all arm imbalance") {
    // y = 2x exactly; arm A holds the low-x units, B the high-x units.
    // theta = 2, rho^2 = 1, and both adjusted means land on the SAME value
    // (the covariate explains the entire between-arm difference):
    // A: ybar=3, xbar=1.5 -> 3 - 2*(1.5-2.5) = 5 ; B: 7 - 2*(3.5-2.5) = 5.
    val df = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0), ("B", 3.0, 6.0), ("B", 4.0, 8.0))
      .toDF("arm", "x", "y")
    val r = Experiment.cuped(df, "arm", "x", "y").orderBy(col("arm")).collect()
    assert(r.length == 2)
    val a = r(0); val b = r(1)
    assert(a.getString(0) == "A" && a.getLong(1) == 2L)
    assert(math.abs(a.getDouble(2) - 3.0) < 1e-9) // raw mean A
    assert(math.abs(b.getDouble(2) - 7.0) < 1e-9) // raw mean B
    assert(math.abs(a.getDouble(3) - 5.0) < 1e-9) // adjusted A
    assert(math.abs(b.getDouble(3) - 5.0) < 1e-9) // adjusted B
    assert(math.abs(a.getDouble(4) - 2.0) < 1e-9) // theta
    assert(math.abs(a.getDouble(5) - 1.0) < 1e-9) // var reduction = rho^2
  }

  test("cuped: uncorrelated covariate leaves means untouched, rho^2 ~ 0") {
    // x symmetric within each y level -> cov(x,y) = 0 -> theta = 0
    val df = Seq(("A", 1.0, 10.0), ("A", 3.0, 10.0),
      ("B", 1.0, 20.0), ("B", 3.0, 20.0)).toDF("arm", "x", "y")
    val r = Experiment.cuped(df, "arm", "x", "y").orderBy(col("arm")).collect()
    assert(math.abs(r(0).getDouble(4)) < 1e-9) // theta = 0
    assert(math.abs(r(0).getDouble(3) - r(0).getDouble(2)) < 1e-9)
    assert(math.abs(r(1).getDouble(3) - r(1).getDouble(2)) < 1e-9)
    assert(math.abs(r(0).getDouble(5)) < 1e-9)
  }

  test("cuped: zero covariate variance yields null theta, not a crash") {
    val df = Seq(("A", 1.0, 2.0), ("B", 1.0, 5.0)).toDF("arm", "x", "y")
    val r = Experiment.cuped(df, "arm", "x", "y").collect()
    assert(r.forall(_.isNullAt(4)))
    assert(r.forall(_.isNullAt(3))) // adjusted mean undefined without theta
  }

  test("srm: balanced arms give chi2 = 0, imbalance is flagged") {
    val ok = (1 to 50).map(i => (if (i % 2 == 0) "A" else "B")).toDF("arm")
    val rOk = Experiment.srm(ok, "arm").collect()
    assert(rOk.forall(_.getDouble(3) == 0.0))
    assert(rOk.forall(_.getLong(4) == 1L))
    // 90/10 on n=100: chi2 = (40^2/50)*2 = 64 — far past any alpha
    val bad = ((1 to 90).map(_ => "A") ++ (1 to 10).map(_ => "B")).toDF("arm")
    val rBad = Experiment.srm(bad, "arm").collect()
    assert(rBad.forall(r => math.abs(r.getDouble(3) - 64.0) < 1e-9))
    assert(rBad.forall(r => r.getDouble(2) == 50.0))
  }

  test("srm: generalizes to k arms with dof = k-1") {
    val df = ((1 to 30).map(_ => "A") ++ (1 to 30).map(_ => "B") ++
      (1 to 30).map(_ => "C")).toDF("arm")
    val r = Experiment.srm(df, "arm").collect()
    assert(r.length == 3)
    assert(r.forall(_.getLong(4) == 2L))
    assert(r.forall(_.getDouble(3) == 0.0))
  }

  test("rankAuc: perfect separation gives 1, reversed gives 0") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 0), ("g", 2.0, 0), ("g", 3.0, 1), ("g", 4.0, 1),
      ("h", 1.0, 1), ("h", 2.0, 1), ("h", 3.0, 0), ("h", 4.0, 0))
      .toDF("grp", "score", "label")
    val out = Experiment.rankAuc(df, "grp", "score", "label")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("g") == 1.0 && out("h") == 0.0)
  }

  test("rankAuc: all-tied scores give exactly 0.5 via midranks") {
    import spark.implicits._
    val df = Seq(("g", 7.0, 1), ("g", 7.0, 0), ("g", 7.0, 1), ("g", 7.0, 0))
      .toDF("grp", "score", "label")
    val r = Experiment.rankAuc(df, "grp", "score", "label").collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getDouble(3) == 0.5)
  }

  test("rankAuc: hand-computed mixed case and single-class null") {
    import spark.implicits._
    // scores 1,2,3 labels 1,0,1: pos ranks 1+3 = 4, U = 4-3 = 1, AUC = 1/2
    val df = Seq(("g", 1.0, 1), ("g", 2.0, 0), ("g", 3.0, 1),
      ("p", 1.0, 1), ("p", 2.0, 1)).toDF("grp", "score", "label")
    val out = Experiment.rankAuc(df, "grp", "score", "label").collect()
    val g = out.find(_.getString(0) == "g").get
    assert(g.getDouble(3) == 0.5)
    assert(out.find(_.getString(0) == "p").get.isNullAt(3))
  }

  test("rankAuc: window orders distinct scores, not raw rows") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 0), ("g", 1.0, 1)).toDF("grp", "score", "label")
    val plan = Experiment.rankAuc(df, "grp", "score", "label")
      .queryExecution.optimizedPlan.toString
    // the tie-group aggregate sits BELOW the window: the per-row input never
    // reaches the sort
    val winIdx = plan.indexOf("Window")
    val aggBelow = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx)
  }

  test("rankAuc: random differential vs brute-force pairwise AUC with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // small score domain → dense ties, the hard case for midranks
    val rows = (1 to 300).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val score = rnd.nextInt(5).toDouble
      val label = if (rnd.nextDouble() < 0.3 + score / 10) 1 else 0
      (g, score, label)
    }
    val out = Experiment.rankAuc(rows.toDF("grp", "score", "label"),
        "grp", "score", "label")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val pos = rs.filter(_._3 == 1).map(_._2)
      val neg = rs.filter(_._3 == 0).map(_._2)
      val brute = pos.flatMap(p => neg.map(n =>
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum /
        (pos.length.toDouble * neg.length)
      assert(approx(out(g), math.round(brute * 1e6) / 1e6, 1e-9),
        s"group $g: ${out(g)} vs $brute")
    }
  }

  test("bhFdr: one extreme group is rejected, null groups are not") {
    import spark.implicits._
    // A: 90/100 vs pooled ~0.58 → |z| ≈ 7, p ≈ 0; B..E at the pooled rate
    val rows = (1 to 100).map(i => ("A", if (i <= 90) 1 else 0)) ++
      Seq("B", "C", "D", "E").flatMap(g =>
        (1 to 100).map(i => (g, if (i <= 50) 1 else 0)))
    val out = Experiment.bhFdr(rows.toDF("grp", "flag"), "grp", "flag")
      .collect()
    val byGrp = out.map(r => r.getString(0) ->
      (r.getDouble(5), r.getBoolean(7))).toMap
    assert(byGrp("A")._1 < 1e-6 && byGrp("A")._2)
    assert(Seq("B", "C", "D", "E").forall(!byGrp(_)._2))
    // BH frontier is monotone: significance is a prefix of the p-ranking
    val flags = out.sortBy(_.getLong(6)).map(_.getBoolean(7))
    assert(!flags.dropWhile(identity).contains(true))
  }

  test("bhFdr: erfc approximation hits known normal quantiles") {
    import spark.implicits._
    // 60/100 vs three 50/100 groups: z_A ≈ 1.734 → two-sided p ≈ 0.083
    val rows = (1 to 100).map(i => ("A", if (i <= 60) 1 else 0)) ++
      Seq("B", "C", "D").flatMap(g =>
        (1 to 100).map(i => (g, if (i <= 50) 1 else 0)))
    val out = Experiment.bhFdr(rows.toDF("grp", "flag"), "grp", "flag")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    val z = a.getDouble(4)
    // exact two-proportion z: (0.6 - 0.5) / sqrt(0.525·0.475·(1/100 + 1/300))
    val zExp = 0.1 / math.sqrt(0.525 * 0.475 * (1.0 / 100 + 1.0 / 300))
    assert(approx(z, zExp, 1e-4))
    // the engine must reproduce the A&S 7.1.26 polynomial exactly (the
    // oracle depends on it); the polynomial itself is within 1.5e-7 of erfc
    val p = a.getDouble(5)
    val pExact = {
      val x = math.abs(zExp) / math.sqrt(2.0)
      val t = 1.0 / (1.0 + 0.3275911 * x)
      val poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
        t * (-1.453152027 + t * 1.061405429))))
      poly * math.exp(-x * x)
    }
    assert(approx(p, pExact, 1e-5))
  }

  test("cuped: plan is two aggregates, no window, no raw-row second pass") {
    val df = Seq(("A", 1.0, 2.0), ("B", 3.0, 4.0)).toDF("arm", "x", "y")
    val plan = Experiment.cuped(df, "arm", "x", "y")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("Aggregate"))
  }

  test("cohensKappa: textbook 2x2 fixture (po=0.7, pe=0.5, kappa=0.4)") {
    // 50 items: 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes
    val df = (
      Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(5)(("y", "n")) ++ Seq.fill(10)(("n", "y"))
    ).toDF("pred", "truth")
    val r = Experiment.cohensKappa(df, "pred", "truth").collect().head
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 0.7)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.4)
  }

  test("cohensKappa: perfect agreement is 1, constant raters are null") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("pred", "truth")
    assert(Experiment.cohensKappa(perfect, "pred", "truth")
      .collect().head.getDouble(3) == 1.0)
    val constant = Seq(("a", "a"), ("a", "a")).toDF("pred", "truth")
    val r = Experiment.cohensKappa(constant, "pred", "truth").collect().head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.isNullAt(3))
  }

  test("cohensKappa: disjoint label sets give zero expected-agreement term") {
    // pred only says x/y, truth only says u/v: po=0, pe=0, kappa=0
    val df = Seq(("x", "u"), ("y", "v"), ("x", "v")).toDF("pred", "truth")
    val r = Experiment.cohensKappa(df, "pred", "truth").collect().head
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("powerMde: hand-computed MDE from known per-arm variances") {
    // arm A: 1,3 (mean 2, var 2); arm B: 2,6 (mean 4, var 8)
    val df = Seq(("s", "A", 1.0), ("s", "A", 3.0), ("s", "B", 2.0),
      ("s", "B", 6.0)).toDF("seg", "arm", "v")
    val r = Experiment.powerMde(df, "seg", "arm", "v").collect().head
    val mde = (Experiment.ZAlphaTwoSided05 + Experiment.ZPower80) *
      math.sqrt(2.0 / 2 + 8.0 / 2)
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 4.0)
    assert(approx(r.getDouble(5), mde, 1e-6))
    assert(approx(r.getDouble(6), mde / 2.0, 1e-6))
  }

  test("powerMde: single-row arms and missing arms are dropped") {
    val df = Seq(("one", "A", 1.0), ("one", "B", 2.0), ("one", "B", 3.0),
      ("noB", "A", 1.0), ("noB", "A", 2.0)).toDF("seg", "arm", "v")
    assert(Experiment.powerMde(df, "seg", "arm", "v").collect().isEmpty)
  }

  test("conformalGate: zero-noise linear data covers everything with q=0") {
    // y = 10 + 2x exactly: residuals are 0 on both splits → q=0, coverage=1
    val rows = (1 to 40).map(i => (i.toLong, i.toDouble, 10.0 + 2.0 * i))
    val df = rows.toDF("id", "x", "y")
    val r = Experiment.conformalGate(df, "x", "y", col("id") % 4 === 0,
      alpha = 0.1).collect().head
    assert(r.getLong(0) == 10 && r.getLong(1) == 30)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 10.0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 1.0)
  }

  test("conformalGate: coverage tracks 1 - alpha on noisy data") {
    // deterministic pseudo-noise in [-5, 5); exchangeable between splits
    val rows = (1 to 2000).map { i =>
      val noise = ((i * 2654435761L) % 1000) / 100.0 - 5.0
      (i.toLong, (i % 50).toDouble, 3.0 * (i % 50) + noise)
    }
    val df = rows.toDF("id", "x", "y")
    val r = Experiment.conformalGate(df, "x", "y", col("id") % 4 === 0,
      alpha = 0.2).collect().head
    val cov = r.getDouble(5)
    assert(cov >= 0.78 && cov <= 0.9, s"coverage $cov out of band")
  }

  test("conformalGate: quantile index is exact at the integer boundary") {
    // n_cal = 9, alpha = 0.1 → k = ceil(10 * 0.9) = 9 (double arithmetic
    // would give 10); with all-zero residuals the selection must not run
    // past the calibration set
    val rows = (1 to 36).map(i => (i.toLong, i.toDouble, i.toDouble))
    val df = rows.toDF("id", "x", "y")
    val r = Experiment.conformalGate(df, "x", "y", col("id") % 4 === 0,
      alpha = 0.1).collect().head
    assert(r.getLong(0) == 9 && r.getDouble(5) == 1.0)
  }

  test("alwaysValidPValue: p_min is monotone, degenerate days are null, " +
    "a strong effect drives p down") {
    val rows =
      // day 1: one obs per arm -> null p
      Seq(("s", "2024-01-01", "A", 10.0), ("s", "2024-01-01", "B", 10.0)) ++
      // days 2-4: A consistently ~10 above B
      (2 to 4).flatMap { d =>
        (1 to 20).flatMap(i => Seq(
          ("s", f"2024-01-0$d", "A", 20.0 + (i % 3)),
          ("s", f"2024-01-0$d", "B", 10.0 + (i % 3))))
      }
    val df = rows.toDF("seg", "day", "arm", "v")
      .select(col("seg"), col("day").cast("date").as("day"), col("arm"),
        col("v"))
    val out = Experiment.alwaysValidPValue(df, "seg", "day", "arm", "v",
        rho = 1.0)
      .orderBy("day").collect()
    assert(out.length == 4)
    assert(out(0).isNullAt(5) && out(0).isNullAt(6)) // day 1 degenerate
    val ps = out.drop(1).map(_.getDouble(5))
    val pmins = out.drop(1).map(_.getDouble(6))
    assert(pmins.sliding(2).forall(w => w.length < 2 || w(1) <= w(0)))
    // decisive effects round to 0.0 at 6 decimals — p lives in [0, 1]
    assert(ps.forall(x => x >= 0.0 && x <= 1.0))
    // 120 obs of a 10-point lift vs rho=1: decisive
    assert(pmins.last < 0.01, s"p_min ${pmins.last}")
  }

  test("alwaysValidPValue: a true null (identical arms) keeps p at 1") {
    val rows = (1 to 3).flatMap { d =>
      (1 to 15).flatMap(i => Seq(
        ("s", f"2024-02-0$d", "A", 10.0 + (i % 5)),
        ("s", f"2024-02-0$d", "B", 10.0 + (i % 5))))
    }
    val df = rows.toDF("seg", "day", "arm", "v")
      .select(col("seg"), col("day").cast("date").as("day"), col("arm"),
        col("v"))
    val out = Experiment.alwaysValidPValue(df, "seg", "day", "arm", "v", 1.0)
      .orderBy("day").collect()
    // delta = 0 exactly -> exp term 1, lambda = sqrt(V/(V+1)) < 1 -> p = 1
    assert(out.forall(r => r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0))
  }

  test("krippendorffAlpha reproduces the canonical 4-rater example " +
    "(Krippendorff 2011, nominal alpha = 0.743)") {
    import spark.implicits._
    // 12 units, 4 raters A-D with missing cells; published nominal alpha
    // for this dataset is 0.743 (exact: 0.743421 at 6dp)
    val a = Seq(1, 2, 3, 3, 2, 1, 4, 1, 2, 0, 0, 0)
    val b = Seq(1, 2, 3, 3, 2, 2, 4, 1, 2, 5, 0, 3)
    val c = Seq(0, 3, 3, 3, 2, 3, 4, 2, 2, 5, 1, 0)
    val d = Seq(1, 2, 3, 3, 2, 4, 4, 1, 2, 5, 1, 0)
    val rows = Seq(a, b, c, d).zipWithIndex.flatMap { case (r, ri) =>
      r.zipWithIndex.collect { case (v, u) if v != 0 =>
        (u.toLong, s"r$ri", v.toString)
      }
    }
    val out = Experiment.krippendorffAlpha(
        rows.toDF("u", "rater", "label"), "u", "label", maxRaters = 4)
      .collect().head
    assert(out.getLong(0) == 11) // unit 11 has a single rating — not pairable
    assert(out.getLong(1) == 40L)
    assert(approx(out.getDouble(2), 0.2, 1e-6))       // D_o
    assert(approx(out.getDouble(3), 0.779487, 1e-6))  // D_e
    assert(approx(out.getDouble(4), 0.743421, 1e-6))
  }

  test("krippendorffAlpha: perfect agreement gives alpha = 1, and " +
    "systematic disagreement goes negative") {
    import spark.implicits._
    val perfect = (0 until 10).flatMap(u =>
      Seq((u.toLong, "a", u % 2), (u.toLong, "b", u % 2)))
      .toDF("u", "rater", "label")
    assert(Experiment.krippendorffAlpha(perfect, "u", "label")
      .collect().head.getDouble(4) == 1.0)
    val opposite = (0 until 10).flatMap(u =>
      Seq((u.toLong, "a", 0), (u.toLong, "b", 1)))
      .toDF("u", "rater", "label")
    assert(Experiment.krippendorffAlpha(opposite, "u", "label")
      .collect().head.getDouble(4) < 0.0)
  }

  test("krippendorffAlpha: a unit with more ratings than maxRaters fails " +
    "loudly instead of silently corrupting alpha") {
    import spark.implicits._
    // unit 0 carries 5 ratings but maxRaters = 3: the lcm scaling would
    // truncate (L div 4) — the contract violation must raise at execution
    val rows = (0 until 5).map(r => (0L, s"r$r", r % 2)) ++
      Seq((1L, "a", 0), (1L, "b", 1))
    val e = intercept[Exception] {
      Experiment.krippendorffAlpha(rows.toDF("u", "rater", "label"),
        "u", "label", maxRaters = 3).collect()
    }
    assert(e.getMessage.contains("maxRaters") ||
      Option(e.getCause).exists(_.getMessage.contains("maxRaters")),
      s"expected a maxRaters contract error, got: ${e.getMessage}")
  }

  test("diffInDiff recovers a planted treatment effect on top of a shared " +
    "time trend") {
    import spark.implicits._
    // control: 10 → 13 (trend +3); treated: 20 → 28 (trend +3, effect +5)
    def cellRows(t: Boolean, p: Boolean, base: Long) =
      (0 until 50).map(i => (t, p, base + (i % 3))) // small within-cell noise
    val rows = cellRows(t = false, p = false, 10) ++
      cellRows(t = false, p = true, 13) ++
      cellRows(t = true, p = false, 20) ++
      cellRows(t = true, p = true, 28)
    val out = Experiment.diffInDiff(rows.toDF("treated", "post", "v"),
      "treated", "post", "v").collect().head
    assert(out.getLong(0) == 200)
    assert(approx(out.getDouble(5), 5.0, 1e-9), s"did = ${out.getDouble(5)}")
    assert(out.getDouble(7) > 10, "effect >> noise must be significant")
  }

  test("diffInDiff: identical trends and no effect give did = 0") {
    import spark.implicits._
    val rows = for {
      t <- Seq(false, true); p <- Seq(false, true); i <- 0 until 30
    } yield (t, p, (if (p) 15L else 10L) + (i % 4))
    val out = Experiment.diffInDiff(rows.toDF("treated", "post", "v"),
      "treated", "post", "v").collect().head
    assert(out.getDouble(5) == 0.0)
  }

  test("mantelHaenszel: hand-computed two-stratum pooled OR vs crude") {
    import org.apache.spark.sql.functions.col
    // stratum 1 cells (a,b,c,d) = (2,1,1,2); stratum 2 = (3,1,1,3)
    // MH = (4/6 + 9/8) / (1/6 + 1/8) = 43/7; crude = 25/4
    def rows(h: Int, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((h, true, true)) ++ Seq.fill(b)((h, true, false)) ++
        Seq.fill(c)((h, false, true)) ++ Seq.fill(d)((h, false, false))
    val df = (rows(1, 2, 1, 1, 2) ++ rows(2, 3, 1, 1, 3))
      .toDF("h", "e", "y")
    val out = Experiment.mantelHaenszel(df, col("h"), col("e"), col("y"))
      .collect().head
    assert(out.getLong(0) == 2L && out.getLong(1) == 14L)
    assert(math.abs(out.getDouble(2) - 25.0 / 4.0) < 1e-9, "crude")
    assert(math.abs(out.getDouble(3) - 43.0 / 7.0) < 1e-9, "mh")
  }

  test("mantelHaenszel: no discordant cells anywhere -> null ORs") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1, true, true), (1, false, false), (2, true, true))
      .toDF("h", "e", "y")
    val out = Experiment.mantelHaenszel(df, col("h"), col("e"), col("y"))
      .collect().head
    assert(out.isNullAt(2) && out.isNullAt(3))
  }

  test("permutationTest: planted shift -> tiny p; label-free data -> large p; " +
      "deterministic across runs") {
    import org.apache.spark.sql.functions.col
    val shifted = ((1 to 60).map(i => (i.toLong, true, 100.0 + i % 3)) ++
      (61 to 120).map(i => (i.toLong, false, 1.0 + i % 3)))
      .toDF("k", "f", "v")
    val o1 = Experiment.permutationTest(shifted, col("k"), col("f"), col("v"),
      reps = 199).collect().head
    assert(o1.getLong(0) == 120L && o1.getLong(1) == 199L)
    assert(math.abs(o1.getDouble(2) - 99.0) < 1e-9, s"obs ${o1.getDouble(2)}")
    assert(o1.getDouble(4) <= 0.01, s"p ${o1.getDouble(4)}")
    // p respects the add-one formula
    assert(math.abs(o1.getDouble(4) -
      (o1.getLong(3) + 1.0) / 200.0) < 1e-12)
    val o2 = Experiment.permutationTest(shifted, col("k"), col("f"), col("v"),
      reps = 199).collect().head
    assert(o1.getDouble(4) == o2.getDouble(4), "hash permutations are fixed")
    val flat = (1 to 120).map(i => (i.toLong, i % 2 == 0, 5.0))
      .toDF("k", "f", "v")
    val o3 = Experiment.permutationTest(flat, col("k"), col("f"), col("v"),
      reps = 199).collect().head
    assert(o3.getDouble(4) == 1.0, s"constant outcome -> p=1, got $o3")
  }

  test("mcnemar: hand-computed discordant cells") {
    import org.apache.spark.sql.functions.col
    // 5 both right, 3 only-A right, 1 only-B right, 2 both wrong
    val df = (Seq.fill(5)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(2)((false, false)))
      .toDF("ca", "cb")
    val out = Experiment.mcnemar(df, col("ca"), col("cb")).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((11L, 5L, 3L, 1L)))
    assert(out.getDouble(4) == 1.0) // (3-1)^2 / 4
    val agree = Seq((true, true), (false, false)).toDF("ca", "cb")
    assert(Experiment.mcnemar(agree, col("ca"), col("cb"))
      .collect().head.isNullAt(4))
  }
}
