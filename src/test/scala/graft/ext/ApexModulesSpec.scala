package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Golden + property tests for the round-8 batch-#5 modules: RankCorr,
  * Contingency, RatioMetric, Periodogram, Sketches, TextStats.vocabCoverage,
  * Profiling.freshness.
  */
class ApexModulesSpec extends SparkTestBase {
  import spark.implicits._

  // --------------------------------------------------------------- RankCorr

  test("spearman: perfect monotone (nonlinear) association is exactly +1, " +
    "reversal is -1") {
    val up = Seq((1.0, 1.0), (2.0, 8.0), (3.0, 27.0), (4.0, 64.0), (5.0, 125.0))
      .toDF("x", "y")
    val rho = RankCorr.spearman(up, "x", "y").collect().head.getDouble(1)
    assert(approx(rho, 1.0), s"monotone cube must give rho=1, got $rho")
    val down = up.withColumn("y", -col("y"))
    val rho2 = RankCorr.spearman(down, "x", "y").collect().head.getDouble(1)
    assert(approx(rho2, -1.0), s"reversed must give rho=-1, got $rho2")
  }

  test("spearman: tie handling matches the textbook average-rank value") {
    // x = [1,1,2], y = [10,20,30]: avg ranks x=(1.5,1.5,3), y=(1,2,3)
    // rho = Pearson((1.5,1.5,3),(1,2,3)) = (3*13.5-6*6)/sqrt((3*13.5-36)(3*14-36))
    //     = 4.5/sqrt(4.5*6) = 4.5/sqrt(27) = 0.8660254...
    val df = Seq((1.0, 10.0), (1.0, 20.0), (2.0, 30.0)).toDF("x", "y")
    val out = RankCorr.spearman(df, "x", "y").collect().head
    assert(out.getLong(0) == 3L)
    assert(approx(out.getDouble(1), 4.5 / math.sqrt(27.0)),
      s"tie-aware rho wrong: ${out.getDouble(1)}")
  }

  test("spearman: invariant under strictly monotone transform of either side") {
    val df = Seq.tabulate(40)(i => (i.toDouble, ((i * 7) % 40).toDouble))
      .toDF("x", "y")
    val base = RankCorr.spearman(df, "x", "y").collect().head.getDouble(1)
    val tx = df.withColumn("x", exp(col("x") / 10))
      .withColumn("y", pow(col("y") + 1, 3))
    val trans = RankCorr.spearman(tx, "x", "y").collect().head.getDouble(1)
    assert(approx(base, trans, 1e-12),
      s"rank correlation must survive monotone transforms: $base vs $trans")
  }

  // ------------------------------------------------------------ Contingency

  test("chiSquareCramersV: independent margins give chi2 = 0, perfect " +
    "association gives V = 1") {
    // independence: every (a,b) cell count = product form 2x2 with equal rows
    val ind = Seq.fill(10)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(10)(("a2", "b2"))
    val o1 = Contingency.chiSquareCramersV(ind.toDF("a", "b"), "a", "b")
      .collect().head
    assert(approx(o1.getAs[Double]("chi2"), 0.0, 1e-9))
    assert(approx(o1.getAs[Double]("cramers_v"), 0.0, 1e-9))
    // perfect: a determines b -> chi2 = N*min(r-1,c-1), V = 1
    val dep = Seq.fill(7)(("a1", "b1")) ++ Seq.fill(9)(("a2", "b2"))
    val o2 = Contingency.chiSquareCramersV(dep.toDF("a", "b"), "a", "b")
      .collect().head
    assert(approx(o2.getAs[Double]("cramers_v"), 1.0, 1e-9),
      s"deterministic association must give V=1: $o2")
    assert(o2.getAs[Long]("dof") == 1L)
  }

  test("chiSquareCramersV: hand-computed 2x2 including an empty cell") {
    // cells: (a1,b1)=4, (a1,b2)=0(empty), (a2,b1)=1, (a2,b2)=3; N=8
    // ra=(4,4) cb=(5,3); e11=2.5 e12=1.5 e21=2.5 e22=1.5
    // chi2 = (1.5²/2.5)+(1.5²/1.5)+(1.5²/2.5)+(1.5²/1.5) = 0.9+1.5+0.9+1.5 = 4.8
    val df = (Seq.fill(4)(("a1", "b1")) ++ Seq.fill(1)(("a2", "b1")) ++
      Seq.fill(3)(("a2", "b2"))).toDF("a", "b")
    val o = Contingency.chiSquareCramersV(df, "a", "b").collect().head
    assert(approx(o.getAs[Double]("chi2"), 4.8, 1e-9), s"chi2 wrong: $o")
    assert(approx(o.getAs[Double]("cramers_v"), math.sqrt(4.8 / 8), 1e-9))
  }

  // ------------------------------------------------------------ RatioMetric

  test("deltaMethodRatio: identical clusters have zero variance -> se = 0") {
    val df = Seq.tabulate(6)(i => ("g", i.toLong, 500L, 2L))
      .toDF("grp", "cl", "xc", "yc")
    val o = RatioMetric.deltaMethodRatio(df, "grp", "cl",
      col("xc").cast("decimal(19,0)"), col("yc")).collect().head
    assert(approx(o.getAs[Double]("ratio"), 250.0))
    assert(approx(o.getAs[Double]("se"), 0.0, 1e-12), s"se must be 0: $o")
  }

  test("deltaMethodRatio: matches a directly-computed delta-method SE") {
    // clusters (x, y): (100,1), (300,2), (200,1), (400,4)
    val xs = Seq(100.0, 300.0, 200.0, 400.0)
    val ys = Seq(1.0, 2.0, 1.0, 4.0)
    val n = 4.0
    val xb = xs.sum / n; val yb = ys.sum / n; val r = xs.sum / ys.sum
    val vx = xs.map(v => (v - xb) * (v - xb)).sum / (n - 1)
    val vy = ys.map(v => (v - yb) * (v - yb)).sum / (n - 1)
    val cxy = xs.zip(ys).map { case (a, b) => (a - xb) * (b - yb) }.sum / (n - 1)
    val se = math.sqrt((vx - 2 * r * cxy + r * r * vy) / (n * yb * yb))
    val df = xs.zip(ys).zipWithIndex
      .map { case ((x, y), i) => ("g", i.toLong, x.toLong, y.toLong) }
      .toDF("grp", "cl", "xc", "yc")
    val o = RatioMetric.deltaMethodRatio(df, "grp", "cl",
      col("xc").cast("decimal(19,0)"), col("yc")).collect().head
    assert(approx(o.getAs[Double]("ratio"), r, 1e-9))
    assert(approx(o.getAs[Double]("se"), se, 1e-9),
      s"delta-method se: expected $se got $o")
  }

  // ------------------------------------------------------------ Periodogram

  test("anovaPeriodogram: an exact 7-day cycle explains all variance at p=7 " +
    "(and its multiple 14), and less elsewhere") {
    val days = Seq.tabulate(70)(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        BigDecimal(1000000L * ((i % 7) + 1))))
    val df = days.toDF("day", "x").withColumn("x", col("x").cast("decimal(19,0)"))
    val out = Periodogram.anovaPeriodogram(df, "day", "x", 2, 14)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(approx(out(7), 1.0, 1e-9), s"p=7 must explain everything: $out")
    assert(approx(out(14), 1.0, 1e-9), s"p=14 folds 7-cycles exactly: $out")
    assert(out(2) < 0.999 && out(3) < 0.999,
      s"non-divisor periods must explain strictly less: $out")
    out.values.foreach(v =>
      assert(v >= -1e-9 && v <= 1.0 + 1e-9, s"r2 out of [0,1]: $out"))
  }

  // --------------------------------------------------------------- Sketches

  test("countMinTopKAudit: estimates never underestimate, and with a sketch " +
    "far wider than the item count the top-k estimates are exact") {
    val items = (Seq.fill(50)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(20)(3L) ++
      (4L to 13L)).toDF("item_id")
    val audit = Sketches.countMinTopKAudit(items, "item_id", k = 5,
      depth = 4, width = 1024).collect()
    assert(audit.length == 5)
    audit.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"CMS must never underestimate: $r")
    }
    // 13 items in 1024 buckets x 4 rows: some row is collision-free for each
    // top item with overwhelming odds; all golden counts recoverable
    val top = audit.map(r => r.getAs[Long]("item") -> r.getAs[Long]("true_cnt"))
    assert(top.take(3).toSeq == Seq(1L -> 50L, 2L -> 30L, 3L -> 20L))
  }

  test("countMinSketch: sketch mass equals total row count per hash row") {
    val items = (1L to 100L).flatMap(i => Seq.fill((i % 5).toInt + 1)(i))
      .toDF("item_id")
    val n = items.count()
    val sketch = Sketches.countMinSketch(items, "item_id", depth = 3, width = 16)
    val perRow = sketch.groupBy("j").agg(sum("bucket_cnt").as("mass"))
      .collect().map(r => r.getAs[Long]("mass"))
    assert(perRow.length == 3 && perRow.forall(_ == n),
      s"each hash row must conserve total mass $n: ${perRow.toSeq}")
  }

  // ----------------------------------------------- TextStats.vocabCoverage

  test("vocabCoverage: coverage is monotone in V, bounded by 1, and total " +
    "once V >= vocabulary size") {
    val docs = Seq("a a a b b c", "a b c d", "a e").toDF("text")
    val out = TextStats.vocabCoverage(docs, "text", Seq(1, 2, 5, 100))
      .collect().map(r => r.getAs[Int]("vocab_size") ->
        r.getAs[Double]("coverage")).toMap
    assert(out(1) == math.rint(1e6 * 5.0 / 12) / 1e6) // 'a' x5 of 12 tokens
    assert(out(1) <= out(2) && out(2) <= out(5) && out(5) <= out(100))
    assert(approx(out(100), 1.0), s"V beyond vocab must cover all: $out")
  }

  // ------------------------------------------------ Sketches.hyperLogLog

  test("hyperLogLogAudit: multiplicity-invariant (a set property) and " +
    "within tolerable error at m=64") {
    val once = (1L to 1000L).toDF("item_id")
    val thrice = (1L to 1000L).flatMap(i => Seq(i, i, i)).toDF("item_id")
    val e1 = Sketches.hyperLogLogAudit(once, "item_id").collect().head
    val e3 = Sketches.hyperLogLogAudit(thrice, "item_id").collect().head
    assert(e1.getAs[Double]("hll_estimate") == e3.getAs[Double]("hll_estimate"),
      "HLL must depend only on the distinct set, not multiplicities")
    assert(e1.getAs[Long]("true_distinct") == 1000L)
    // m=64 -> relative error ~1.04/8 = 13%; allow 3 sigma
    assert(e1.getAs[Double]("rel_err_pct") < 40.0,
      s"estimate too far off: $e1")
  }

  // ------------------------------------------------ Experiment.welchTTest

  test("welchTTest: identical arms give t = 0; a shifted arm reproduces the " +
    "hand-computed Welch statistic") {
    val sym = (1 to 10).flatMap(i =>
      Seq(("A", i.toLong, 100L + i), ("B", 1000L + i, 100L + i)))
      .toDF("arm", "uid", "x")
    val o = Experiment.welchTTest(sym, "arm", "uid",
      col("x").cast("decimal(19,0)"), "A", "B").collect().head
    assert(approx(o.getAs[Double]("t_stat"), 0.0, 1e-12), s"t must be 0: $o")
    assert(!o.getAs[Boolean]("significant"))

    // hand case: A = (1,2,3), B = (11,12,13,14): means 2, 12.5
    // va = 1, vb = 5/3; sa = 1/3, sb = 5/12; t = -10.5/sqrt(0.75)
    val ab = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 3L),
      ("B", 4L, 11L), ("B", 5L, 12L), ("B", 6L, 13L), ("B", 7L, 14L))
      .toDF("arm", "uid", "x")
    val o2 = Experiment.welchTTest(ab, "arm", "uid",
      col("x").cast("decimal(19,0)"), "A", "B").collect().head
    val saExp = 1.0 / 3; val sbExp = (5.0 / 3) / 4
    val tExp = (2.0 - 12.5) / math.sqrt(saExp + sbExp)
    val dofExp = math.pow(saExp + sbExp, 2) /
      (saExp * saExp / 2 + sbExp * sbExp / 3)
    assert(approx(o2.getAs[Double]("t_stat"), tExp, 1e-9), s"t wrong: $o2")
    assert(approx(o2.getAs[Double]("dof"), dofExp, 1e-9), s"dof wrong: $o2")
    assert(o2.getAs[Boolean]("significant"))
  }

  // --------------------------------------------- Series.gumbelReturnLevels

  test("gumbelReturnLevels: constant maxima give beta = 0 and level = mean; " +
    "levels are monotone in the horizon") {
    val const = Seq.tabulate(20)(i => (i, BigDecimal(500)))
      .toDF("day", "x").withColumn("x", col("x").cast("decimal(19,0)"))
    val c = Series.gumbelReturnLevels(const, "x", Seq(30, 365)).collect()
    c.foreach { r =>
      assert(approx(r.getAs[Double]("beta"), 0.0, 1e-12))
      assert(approx(r.getAs[Double]("return_level"), 500.0, 1e-9), s"$r")
    }
    val varied = Seq.tabulate(50)(i => (i, BigDecimal(100 + (i * 37) % 60)))
      .toDF("day", "x").withColumn("x", col("x").cast("decimal(19,0)"))
    val lv = Series.gumbelReturnLevels(varied, "x", Seq(10, 30, 90, 365))
      .collect().map(_.getAs[Double]("return_level"))
    assert(lv.sliding(2).forall(p => p(0) < p(1)),
      s"return levels must increase with horizon: ${lv.toSeq}")
  }

  // ------------------------------------------------ TextQuality.trigramNll

  test("trigramNll: single-trigram corpus matches the closed form; " +
    "repetitive text scores lower NLL than diverse text") {
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
    val o = TextQuality.trigramNll(one, "doc_id", "text").collect().head
    // p = 0.6*(1/1) + 0.3*(1/1) + 0.1*(1/3); nll = -ln(p)
    val exp = -math.log(0.6 + 0.3 + 0.1 / 3.0)
    assert(o.getAs[Long]("n_trigrams") == 1L)
    assert(approx(o.getAs[Double]("avg_nll3"), math.rint(exp * 1e6) / 1e6, 1e-9),
      s"closed form mismatch: $o vs $exp")

    // predictability: doc 1's context (a,b) always continues with c;
    // doc 2's same-shape contexts each have 3 competing continuations
    val corpus = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "a b x a b y a b z"))
      .toDF("doc_id", "text")
    val nll = TextQuality.trigramNll(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_nll3")).toMap
    assert(nll(1L) < nll(2L),
      s"deterministic continuation must score lower trigram NLL: $nll")
    nll.values.foreach(v => assert(v >= 0.0,
      s"interpolated p <= 1 implies NLL >= 0: $nll"))
  }

  test("trigramNll: docs with fewer than 3 tokens are absent, not errors") {
    val df = Seq((1L, "only two"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = TextQuality.trigramNll(df, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
  }

  // ------------------------------------------ Clustering.lloydIterations

  test("lloydIterations: well-separated clusters converge to their means " +
    "and cohesion improves with iterations") {
    // two tight cosine clusters in 4-d: around e1 and around e3
    val a = Seq.tabulate(10)(i =>
      (i.toLong, Array(1.0f, 0.05f * i, 0.0f, 0.0f)))
    val b = Seq.tabulate(10)(i =>
      (100L + i, Array(0.0f, 0.0f, 1.0f, 0.04f * i)))
    val vecs = (a ++ b).toDF("vec_id", "embedding")
    val seeds = vecs.filter(col("vec_id").isin(0L, 100L))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val out = Clustering.lloydIterations(vecs, "vec_id", "embedding",
      seeds, "cid", "cvec", iters = 2, dims = 4).collect()
      .map(r => r.getAs[Long]("centroid_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Double]("mean_cos"))).toMap
    assert(out.keySet == Set(0L, 100L))
    assert(out(0L)._1 == 10L && out(100L)._1 == 10L,
      s"separated clusters must keep their members: $out")
    out.values.foreach { case (_, mc) =>
      assert(mc > 0.99, s"mean centroid moved to the cluster interior: $out")
    }
    // cohesion is at least as good as against the raw seed centroids
    val seedPass = Clustering.lloydIterations(vecs, "vec_id", "embedding",
      seeds, "cid", "cvec", iters = 1, dims = 4).collect()
      .map(r => r.getAs[Double]("mean_cos")).sum / 2
    val twoPass = out.values.map(_._2).sum / 2
    assert(twoPass >= seedPass - 1e-12,
      s"mean cosine must not degrade with iterations: $seedPass -> $twoPass")
  }

  // -------------------------------------- Sketches.hyperLogLogGroupedAudit

  test("hyperLogLogGroupedAudit: each group's sketch is independent and " +
    "matches the global audit run on that group alone") {
    val df = ((1L to 500L).map(i => ("g1", i)) ++
      (1L to 80L).map(i => ("g2", i * 1000L))).toDF("grp", "item_id")
    val grouped = Sketches.hyperLogLogGroupedAudit(df, "grp", "item_id")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("hll_estimate"))
      .toMap
    Seq("g1", "g2").foreach { g =>
      val solo = Sketches
        .hyperLogLogAudit(df.filter(col("grp") === g), "item_id")
        .collect().head.getAs[Double]("hll_estimate")
      assert(grouped(g) == solo,
        s"group $g sketch must equal the solo audit: ${grouped(g)} vs $solo")
    }
  }

  // --------------------------------------------- Communities.modularity

  test("modularity: two disjoint triangles under the perfect partition " +
    "score Q = 0.5; the all-in-one partition scores 0") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L),
      (10L, 20L, 1L), (20L, 30L, 1L), (10L, 30L, 1L))
      .toDF("src", "dst", "w")
    val goodLabels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 2L, 20L -> 2L, 30L -> 2L).toDF("node", "label")
    val q1 = Communities.modularity(edges, "src", "dst", "w",
      goodLabels, "node", "label").collect().head
    assert(q1.getAs[Long]("n_communities") == 2L)
    assert(approx(q1.getAs[Double]("modularity"), 0.5, 1e-9), s"$q1")
    val oneLabels = goodLabels.withColumn("label", lit(1L))
    val q0 = Communities.modularity(edges, "src", "dst", "w",
      oneLabels, "node", "label").collect().head
    assert(approx(q0.getAs[Double]("modularity"), 0.0, 1e-9), s"$q0")
  }

  // ------------------------------------- Importance.effectiveSampleSize

  test("effectiveSampleSize: uniform weights give ESS = n; a dominant " +
    "weight collapses the ratio") {
    val uniform = Seq.tabulate(8)(i => ("g", 1L)).toDF("grp", "w")
    val u = Importance.effectiveSampleSize(uniform, "grp",
      col("w").cast("decimal(18,9)")).collect().head
    assert(approx(u.getAs[Double]("ess"), 8.0, 1e-9))
    assert(approx(u.getAs[Double]("ess_ratio"), 1.0, 1e-9))
    // w = (9, 1): ESS = 100/82
    val skewed = Seq(("g", 9L), ("g", 1L)).toDF("grp", "w")
    val s = Importance.effectiveSampleSize(skewed, "grp",
      col("w").cast("decimal(18,9)")).collect().head
    assert(approx(s.getAs[Double]("ess"), 100.0 / 82.0, 1e-9), s"$s")
  }

  // ------------------------------------------------- Experiment.ucb1

  test("ucb1: equal pulls rank by mean; rare arms get the larger bonus; " +
    "scores match the closed form") {
    val pulls = Seq.fill(100)(("a", 1L)) ++ Seq.fill(100)(("b", 0L)) ++
      Seq(("c", 1L), ("c", 1L))
    val out = Experiment.ucb1(pulls.toDF("arm", "rw"), "arm", col("rw"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mean_reward"), r.getAs[Double]("ucb_bonus"),
          r.getAs[Long]("rank"))).toMap
    val n = 202.0
    assert(approx(out("a")._2, math.sqrt(2 * math.log(n) / 100), 1e-12))
    assert(approx(out("c")._2, math.sqrt(2 * math.log(n) / 2), 1e-12))
    assert(out("c")._2 > out("a")._2, "rare arm must get the larger bonus")
    // a: 1 + 0.33, c: 1 + 2.3, b: 0 + 0.33 -> order c, a, b
    assert(out("c")._3 == 1L && out("a")._3 == 2L && out("b")._3 == 3L,
      s"ranking wrong: $out")
  }

  // --------------------------------------------------- ClusterEval

  test("bcubed: the perfect partition scores 1/1/1; one-cluster-everything " +
    "keeps recall 1 and pays in precision") {
    val gold = Seq(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "y")
      .toDF("id", "cls")
    val perfect = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 20L)
      .toDF("id", "cl")
    val p1 = ClusterEval.bcubed(perfect, "id", "cl", gold, "id", "cls")
      .collect().head
    assert(approx(p1.getAs[Double]("bcubed_p"), 1.0, 1e-12))
    assert(approx(p1.getAs[Double]("bcubed_r"), 1.0, 1e-12))
    assert(approx(p1.getAs[Double]("bcubed_f"), 1.0, 1e-12))
    // all four in one cluster: P = (9/4 + 1/4)/4 = 0.625, R = 1
    val lump = perfect.withColumn("cl", lit(1L))
    val p2 = ClusterEval.bcubed(lump, "id", "cl", gold, "id", "cls")
      .collect().head
    assert(approx(p2.getAs[Double]("bcubed_p"), 0.625, 1e-12), s"$p2")
    assert(approx(p2.getAs[Double]("bcubed_r"), 1.0, 1e-12))
  }

  test("adjustedRandIndex: identical partitions give ARI = 1; a direct " +
    "formula re-computation matches on a mixed case") {
    val gold = Seq(1L -> "x", 2L -> "x", 3L -> "y", 4L -> "y", 5L -> "y")
      .toDF("id", "cls")
    val same = Seq(1L -> 7L, 2L -> 7L, 3L -> 8L, 4L -> 8L, 5L -> 8L)
      .toDF("id", "cl")
    val a1 = ClusterEval.adjustedRandIndex(same, "id", "cl", gold, "id", "cls")
      .collect().head
    assert(approx(a1.getAs[Double]("ari"), 1.0, 1e-12), s"$a1")
    // mixed: clusters {1,2,3},{4,5} vs classes {1,2},{3,4,5}
    // cells: (c1,x)=2,(c1,y)=1,(c2,y)=2 -> sidx=1+0+1=2; sa=C(3,2)+C(2,2)=4
    // sb=C(2,2)+C(3,2)=4; cn=C(5,2)=10; exp=1.6; max=4; ari=0.4/2.4
    val mixed = Seq(1L -> 7L, 2L -> 7L, 3L -> 7L, 4L -> 8L, 5L -> 8L)
      .toDF("id", "cl")
    val a2 = ClusterEval.adjustedRandIndex(mixed, "id", "cl", gold, "id", "cls")
      .collect().head
    assert(approx(a2.getAs[Double]("ari"), 0.4 / 2.4, 1e-12), s"$a2")
  }

  // --------------------------------------- TextQuality.heldoutTrigramNll

  test("heldoutTrigramNll: a test doc with fully-unseen vocabulary scores " +
    "exactly -ln(lambda0 / V)") {
    // pick ids deterministically on each side of the 80% md5 split
    val buckets = (1L to 60L).map(i =>
      i -> spark.range(1).select(Splits.hashBucket(lit(i))).collect()
        .head.getLong(0))
    val trainId = buckets.find(_._2 < 80).get._1
    val testId = buckets.find(_._2 >= 80).get._1
    val docs = Seq(
      (trainId, "aa bb cc aa bb cc aa bb"), // V = 3 train types
      (testId, "zz yy xx ww")) // all unseen -> p = 0.05 / 3 per trigram
      .toDF("doc_id", "text")
    val out = TextQuality.heldoutTrigramNll(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(testId),
      s"only the test doc is scored: ${out.toSeq}")
    val exp = -math.log(0.05 * (1.0 / 3.0))
    assert(approx(out.head.getAs[Double]("heldout_nll"),
      math.rint(exp * 1e6) / 1e6, 1e-9),
      s"unseen-vocab closed form: ${out.head} vs $exp")
  }

  test("heldoutTrigramNll: test text matching train verbatim scores far " +
    "lower than shuffled-vocabulary text") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val buckets = (1L to 200L).map(i =>
      i -> spark.range(1).select(Splits.hashBucket(lit(i))).collect()
        .head.getLong(0))
    val trainIds = buckets.filter(_._2 < 80).take(3).map(_._1)
    val testIds = buckets.filter(_._2 >= 80).take(2).map(_._1)
    val docs = (trainIds.map(id => (id, base)) ++
      Seq((testIds(0), base),
        (testIds(1), "dog the over fox quick again brown lazy jumps and")))
      .toDF("doc_id", "text")
    val nll = TextQuality.heldoutTrigramNll(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("heldout_nll")).toMap
    assert(nll(testIds(0)) < nll(testIds(1)),
      s"verbatim test text must score lower NLL: $nll")
  }

  // ------------------------------------- TextQuality.kneserNeyBigramNll

  test("kneserNeyBigramNll: hand-computed closed form on a 3-bigram corpus") {
    // "a b a c": c2 ab=ba=ac=1; ctx a:(c1=2,nf=2) b:(1,1); nb all 1; nbt=3
    // p(b|a)=0.25/2+(0.75*2/2)*(1/3)=0.375; p(a|b)=0.25+0.25=0.5; p(c|a)=0.375
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val o = TextQuality.kneserNeyBigramNll(docs, "doc_id", "text")
      .collect().head
    val exp = -(math.log(0.375) + math.log(0.5) + math.log(0.375)) / 3
    assert(o.getAs[Long]("n_bigrams") == 3L)
    assert(approx(o.getAs[Double]("kn_nll"), math.rint(exp * 1e6) / 1e6, 1e-9),
      s"KN closed form mismatch: $o vs $exp")
  }

  test("kneserNeyBigramNll: deterministic continuation scores lower NLL " +
    "than diverse continuation at equal length") {
    val docs = Seq((1L, "a b a b a b a b"), (2L, "a b a c a d a e"))
      .toDF("doc_id", "text")
    val nll = TextQuality.kneserNeyBigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("kn_nll")).toMap
    assert(nll(1L) < nll(2L), s"predictable text must score lower: $nll")
  }

  // ------------------------------------------------ Privacy.dpSensitivity

  test("dpSensitivity: max contribution, share, and the whale threshold " +
    "are exact") {
    val rows = Seq.fill(9)(("k1", 1L)) ++ Seq(("k1", 2L)) ++
      (1L to 10L).map(u => ("k2", u))
    val out = Privacy.dpSensitivity(rows.toDF("key", "uid"), "key", "uid",
      whalePct = 30).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_events"),
        r.getAs[Long]("n_users"), r.getAs[Long]("max_user_n"),
        r.getAs[Double]("max_share"), r.getAs[Long]("n_whales"))).toMap
    assert(out("k1") == ((10L, 2L, 9L, 0.9, 1L)), s"${out("k1")}")
    // k2: 10 users x1 -> max 1, share 0.1, nobody above 30%
    assert(out("k2") == ((10L, 10L, 1L, 0.1, 0L)), s"${out("k2")}")
  }

  // ------------------------------------------------- HashedEmbedding

  test("hashedVectors: multiplicity scales components; duplicate document " +
    "ranks first with cosine exactly 1") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"), // verbatim dup of the query
      (2L, "alpha alpha beta beta gamma gamma delta delta"), // 2x counts
      (3L, "epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val v0 = HashedEmbedding.hashedVectors(docs.filter(col("doc_id") === 0),
      "doc_id", "text", 64).collect().map(r => r.getLong(1) -> r.getLong(2))
      .toMap
    val v2 = HashedEmbedding.hashedVectors(docs.filter(col("doc_id") === 2),
      "doc_id", "text", 64).collect().map(r => r.getLong(1) -> r.getLong(2))
      .toMap
    assert(v2 == v0.map { case (d, x) => d -> 2 * x },
      s"doubled tokens must double components: $v0 vs $v2")
    val top = HashedEmbedding.topKSimilar(docs, "doc_id", "text",
      queryId = 0L, k = 3).collect()
    assert(top.head.getAs[Long]("doc_id") == 1L)
    assert(approx(top.head.getAs[Double]("cosine"), 1.0, 1e-12),
      s"verbatim dup must have cosine 1: ${top.toSeq}")
    // scaled copy also has cosine 1 (cosine is scale-invariant) -> rank 2
    assert(top(1).getAs[Long]("doc_id") == 2L)
    assert(approx(top(1).getAs[Double]("cosine"), 1.0, 1e-12))
  }

  // ------------------------------------- Experiment.postStratifiedMean

  test("postStratifiedMean: representative sample leaves the mean " +
    "unchanged; skewed response re-weights to the population mix") {
    // population: 10 of h1, 10 of h2; h1 mean 10, h2 mean 20
    val pop = ((1 to 10).map(i => ("h1", i)) ++ (1 to 10).map(i => ("h2", i)))
      .toDF("h", "i")
    val fair = (Seq.tabulate(4)(i => ("h1", i.toLong, 10L + i)) ++
      Seq.tabulate(4)(i => ("h2", 100L + i, 20L + i)))
      .toDF("h", "cid", "x")
    val o1 = Experiment.postStratifiedMean(fair, pop, "h",
      col("x").cast("decimal(19,0)")).collect().head
    assert(approx(o1.getAs[Double]("raw_mean"), o1.getAs[Double]("post_mean"),
      1e-9), s"balanced sample must not move: $o1")
    // skewed: 6 h1 responders, 2 h2 responders -> raw biased toward h1;
    // post re-weights to 50/50
    val skew = (Seq.tabulate(6)(i => ("h1", i.toLong, 10L)) ++
      Seq.tabulate(2)(i => ("h2", 100L + i, 20L)))
      .toDF("h", "cid", "x")
    val o2 = Experiment.postStratifiedMean(skew, pop, "h",
      col("x").cast("decimal(19,0)")).collect().head
    assert(approx(o2.getAs[Double]("raw_mean"), (6 * 10.0 + 2 * 20) / 8, 1e-9))
    assert(approx(o2.getAs[Double]("post_mean"), 15.0, 1e-9),
      s"post-stratified mean must hit the population-weighted 15: $o2")
    assert(approx(o2.getAs[Double]("post_se"), 0.0, 1e-9),
      "zero within-stratum variance implies zero SE")
  }

  // --------------------------------------------- RankCorr.tailDependence

  test("tailDependence: comonotone data gives lambda_u = 1; independent-ish " +
    "alternating data stays far below") {
    val co = Seq.tabulate(100)(i => (i.toDouble, i * 2.0, i.toLong, 1L))
      .toDF("x", "y", "k1", "k2")
    val o = RankCorr.tailDependence(co, "x", "y", Seq("k1", "k2"), Seq(0.9))
      .collect().head
    assert(approx(o.getAs[Double]("lambda_u"), 1.0, 1e-12),
      s"comonotone must have full tail dependence: $o")
    // anti-monotone: largest x pairs with smallest y -> lambda_u = 0
    val anti = Seq.tabulate(100)(i => (i.toDouble, -i * 2.0, i.toLong, 1L))
      .toDF("x", "y", "k1", "k2")
    val a = RankCorr.tailDependence(anti, "x", "y", Seq("k1", "k2"), Seq(0.9))
      .collect().head
    assert(approx(a.getAs[Double]("lambda_u"), 0.0, 1e-12),
      s"anti-monotone must have zero tail dependence: $a")
  }

  // ------------------------------------------------ Forecast.naiveBacktest

  test("naiveBacktest: an exact 7-day cycle makes mae_naive7 = 0 and " +
    "mase7 = 0 while naive-1 pays the cycle's step size") {
    val days = Seq.tabulate(28)(i =>
      ("t", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1)
        .plusDays(i)), BigDecimal(100L + (i % 7) * 10)))
      .toDF("g", "d", "x").withColumn("x", col("x").cast("decimal(19,0)"))
    val o = Forecast.naiveBacktest(days, "g", "d", "x").collect().head
    assert(o.getAs[Long]("n7") == 21L && o.getAs[Long]("n1") == 27L)
    assert(approx(o.getAs[Double]("mae_naive7"), 0.0, 1e-12), s"$o")
    assert(approx(o.getAs[Double]("mase7"), 0.0, 1e-12))
    // naive-1 errors over 27 pairs: 24 steps of |10| + 3 wraps of |60|
    val mae1 = o.getAs[Double]("mae_naive1")
    assert(approx(mae1, (24 * 10.0 + 3 * 60.0) / 27, 1e-9),
      s"naive-1 must pay the step size: $mae1")
  }

  // ------------------------------------------- HistSketch.histQuantilesAudit

  test("histQuantilesAudit: estimates are monotone in p, bracket the data " +
    "range, and hit small error on smooth data") {
    val df = Seq.tabulate(10000)(i => (i.toDouble, i.toLong))
      .toDF("v", "k")
    val out = HistSketch.histQuantilesAudit(df, "v", Seq("k"),
      Seq(0.25, 0.5, 0.9, 0.99), bins = 100).collect()
    val ests = out.map(_.getAs[Double]("est"))
    assert(ests.sliding(2).forall(p => p(0) <= p(1)),
      s"estimates must be monotone in p: ${ests.toSeq}")
    out.foreach { r =>
      assert(r.getAs[Double]("rel_err") < 0.02,
        s"uniform data in 100 bins must estimate within 2%: $r")
      assert(r.getAs[Double]("est") >= 0.0 &&
        r.getAs[Double]("est") <= 9999.0)
    }
  }

  // -------------------------------------------- Layout.zoneMapSkipAudit

  test("zoneMapSkipAudit: value-sorted layout skips all but the chunks " +
    "covering the range; an adversarial interleave skips none") {
    // values 0..639, natural order interleaves lo/hi so EVERY natural chunk
    // straddles the predicate range
    val rows = Seq.tabulate(640)(i =>
      (if (i % 2 == 0) i.toDouble / 2 else 639.0 - i / 2, i.toLong))
      .toDF("v", "k")
    val out = Layout.zoneMapSkipAudit(rows, "v", Seq("k"), chunks = 8,
      lo = 100.0, hi = 120.0).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_skippable"))).toMap
    // interleaved chunks mostly straddle the range (the early ones always
    // do); sorted concentrates the range in one chunk
    assert(out("natural")._2 < out("sorted")._2,
      s"sorting must strictly improve skipping: $out")
    // sorted: 8 chunks of 80 values; [100,120] touches chunk 1 only
    // (80..159); 7 of 8 skip
    assert(out("sorted") == ((8L, 7L)), s"sorted must skip 7/8: $out")
  }

  // --------------------------------------- GraphPaths.percolationAudit

  test("percolationAudit: removing the star hub shatters the giant " +
    "component; a cycle survives any single removal") {
    // star: hub 1 connects 2..11 -> intact largest CC = 11, attacked = 1
    val star = (2L to 11L).map(i => (1L, i)).toDF("src", "dst")
    val s = GraphPaths.percolationAudit(star, "src", "dst", topKHubs = 1)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("largest_cc"))).toMap
    assert(s("intact") == ((11L, 11L)), s"$s")
    assert(s("attacked")._1 == 0L,
      s"a pure star has no edges left after hub removal: $s")
    // 10-cycle: removing the (tie-broken) top hub leaves a 9-path
    val cycle = (0L to 9L).map(i => (i, (i + 1) % 10)).toDF("src", "dst")
    val c = GraphPaths.percolationAudit(cycle, "src", "dst", topKHubs = 1)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("largest_cc"))).toMap
    assert(c("intact") == ((10L, 10L)))
    assert(c("attacked") == ((9L, 9L)),
      s"a cycle must stay connected after one removal: $c")
  }

  // ------------------------------- Profiling.sampledSelfJoinCardinality

  test("sampledSelfJoinCardinality: exact side is sum of squared key " +
    "counts and the estimate is the scaled sample join") {
    val df = (Seq.fill(30)(1L) ++ Seq.fill(20)(2L) ++ (100L to 149L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "rid")
    val o = Profiling.sampledSelfJoinCardinality(df, "k",
      col("rid"), pctSample = 10).collect().head
    assert(o.getAs[Long]("n_rows") == 100L)
    assert(o.getAs[Long]("exact_join_card") == 30L * 30 + 20L * 20 + 50L,
      s"exact must be sum of c^2: $o")
    assert(o.getAs[Long]("estimate") ==
      o.getAs[Long]("sample_join_card") * 100, s"$o")
  }

  test("sampledSelfJoinCardinality: a pctSample that does not divide 100 " +
    "is rejected (the integer scale would silently bias the estimate)") {
    val df = Seq((1L, "k1")).toDF("id", "k")
    val e = intercept[IllegalArgumentException] {
      Profiling.sampledSelfJoinCardinality(df, "k", col("id"), pctSample = 30)
    }
    assert(e.getMessage.contains("divide 100"))
  }

  // --------------------------------------------- RankCompare.topKTurnover

  test("topKTurnover: identical day boards give jaccard 1, disjoint boards " +
    "give 0, and the tie-break picks smaller keys") {
    def day(d: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 5, d))
    // day1/day2 same top-2 {1,2}; day3 disjoint {8,9}
    val rows = Seq(
      (day(1), 1L), (day(1), 1L), (day(1), 2L), (day(1), 3L),
      (day(2), 1L), (day(2), 1L), (day(2), 2L), (day(2), 2L),
      (day(3), 8L), (day(3), 8L), (day(3), 9L))
      .toDF("d", "uid")
    val out = RankCompare.topKTurnover(rows, col("d"), "uid", k = 2)
      .collect().map(r => r.getDate(0).toString ->
        (r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))).toMap
    // day1 top-2 = {1,2} (3 loses the n tie to smaller keys 1,2? counts:
    // 1->2, 2->1, 3->1; rank by n desc, key asc -> {1, 2})
    assert(out("2024-05-02") == ((2L, 1.0)), s"$out")
    assert(out("2024-05-03") == ((0L, 0.0)), s"$out")
    assert(out.size == 2)
  }

  test("topKTurnover: a day with fewer than k distinct keys uses the ACTUAL " +
    "set sizes in the Jaccard denominator, not 2k") {
    def day(d: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 5, d))
    // k=3: day1 top = {1,2,3}; day2 has only 2 distinct keys -> top = {1,2}
    val rows = Seq(
      (day(1), 1L), (day(1), 2L), (day(1), 3L),
      (day(2), 1L), (day(2), 1L), (day(2), 2L))
      .toDF("d", "uid")
    val out = RankCompare.topKTurnover(rows, col("d"), "uid", k = 3)
      .collect().map(r => r.getDate(0).toString ->
        (r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))).toMap
    // |A|=3, |B|=2, common=2 -> 2/(3+2-2) = 2/3, NOT 2/(6-2) = 0.5
    assert(out("2024-05-02")._1 == 2L, s"$out")
    assert(math.abs(out("2024-05-02")._2 - 2.0 / 3.0) < 1e-12, s"$out")
  }

  // ------------------------------------------------- Profiling.freshness

  test("freshness: freshest source has zero staleness; older sources are " +
    "flagged beyond the threshold") {
    val ts = Seq(
      ("feed_a", java.sql.Timestamp.valueOf("2024-01-10 12:00:00")),
      ("feed_a", java.sql.Timestamp.valueOf("2024-01-10 10:00:00")),
      ("feed_b", java.sql.Timestamp.valueOf("2024-01-10 11:30:00")),
      ("feed_c", java.sql.Timestamp.valueOf("2024-01-09 12:00:00")))
      .toDF("source_name", "ts")
    val out = Profiling.freshness(ts, "source_name", "ts", 3600L).collect()
      .map(r => (r.getString(0), r.getAs[Long]("staleness_sec"),
        r.getAs[Boolean]("is_stale"))).toSeq
    assert(out == Seq(("feed_a", 0L, false), ("feed_b", 1800L, false),
      ("feed_c", 86400L, true)), s"unexpected freshness table: $out")
  }
}
