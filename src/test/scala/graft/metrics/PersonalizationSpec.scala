package graft.metrics

import graft.SparkTestBase

class PersonalizationSpec extends SparkTestBase {
  import spark.implicits._

  // Reference doctest fixture (recmetrics_pyspark.py:320-333)
  private def doctestDf = Seq((1, 1), (1, 2), (2, 2), (2, 1), (3, 3), (3, 4))
    .toDF("cod_pessoa", "cod_ean")

  test("doctest golden value 0.666666666666667") {
    val p = Personalization.personalization(doctestDf, "cod_pessoa", "cod_ean")
    assert(approx(p, 0.666666666666667, 1e-12), s"got $p")
  }

  test("DIMSUM path agrees with the self-join path (differential, §5)") {
    val df = doctestDf
    val a = Personalization.personalization(df, "cod_pessoa", "cod_ean")
    val b = Personalization.personalizationDimsum(df, "cod_pessoa", "cod_ean")
    assert(approx(a, b), s"self-join $a vs dimsum $b")
  }

  test("identical lists → 0, disjoint lists → 1") {
    val same = Seq((1, 10), (1, 20), (2, 10), (2, 20)).toDF("u", "i")
    assert(approx(Personalization.personalization(same, "u", "i"), 0.0))
    val disjoint = Seq((1, 10), (1, 20), (2, 30), (2, 40)).toDF("u", "i")
    assert(approx(Personalization.personalization(disjoint, "u", "i"), 1.0))
  }

  test("duplicate (user,item) rows are counted, not binarized (§2.4.4)") {
    // u1 = (2,1) over items {a,b}; u2 = (1,1): cos = 3/(sqrt(5)*sqrt(2))
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")).toDF("u", "i")
    val expectedSim = 3.0 / (math.sqrt(5) * math.sqrt(2))
    val p = Personalization.personalization(df, "u", "i")
    assert(approx(p, 1.0 - expectedSim, 1e-12), s"got $p")
    val d = Personalization.personalizationDimsum(df, "u", "i")
    assert(approx(d, 1.0 - expectedSim, 1e-9), s"dimsum got $d")
  }

  test("larger random-ish differential check across all three engines (v0/v2/DF)") {
    val rows = for (u <- 1 to 30; i <- 1 to 40 if (u * 7 + i * 13) % 5 < 2)
      yield (u, i)
    val df = rows.toDF("u", "i")
    val a = Personalization.personalization(df, "u", "i")
    val b = Personalization.personalizationDimsum(df, "u", "i")
    val c = Personalization.personalizationBlockMatrix(df, "u", "i")
    assert(approx(a, b, 1e-8), s"self-join $a vs dimsum $b")
    assert(approx(a, c, 1e-8), s"self-join $a vs blockmatrix $c")
    assert(a >= 0.0 && a <= 1.0)
  }

  test("hot-item cap: generous cap is exact, tight cap errs small and bounds the join") {
    // fixture where every user shares one universal item, otherwise mostly distinct
    val rows = (for (u <- 1 to 30) yield (u, 0)) ++ // item 0: bought by all 30 users
      (for (u <- 1 to 30; i <- 1 to 40 if (u * 7 + i * 13) % 5 < 1) yield (u, i))
    val df = rows.toDF("u", "i")
    val exact = Personalization.personalization(df, "u", "i")
    // cap above the hottest item's user count → nothing dropped, identical result
    val uncut = Personalization.personalization(df, "u", "i", maxItemUsers = Some(30L))
    assert(approx(uncut, exact, 1e-12))
    // cap that drops only the universal item: error stays small (the universal
    // item carries no discriminative signal) but the u² join term is gone
    val capped = Personalization.personalization(df, "u", "i", maxItemUsers = Some(15L))
    assert(capped != exact)
    assert(math.abs(capped - exact) < 0.15,
      s"cap error too large: exact=$exact capped=$capped")
    // dropping the universal item can only make users look MORE dissimilar
    assert(capped >= exact)
    // pairwiseCosine honors the cap too: pairs sharing ONLY the hot item disappear
    val pairsExact = Personalization.pairwiseCosine(df, "u", "i").count()
    val pairsCapped = Personalization.pairwiseCosine(df, "u", "i", Some(15L)).count()
    assert(pairsCapped < pairsExact)
  }

  test("matrix-mean helpers match the reference's sign conventions (§2.4.6)") {
    // 3x3 similarity matrix, off-diagonal sims all 0.5 → Σ_all = 3 + 6*0.5 = 6
    assert(approx(Personalization.symmetricalMatrixMean(6.0, 3), 0.5))
    assert(approx(Personalization.upperTriangleMean(6.0, 3), 0.5))
    // doctest matrix: users 1,2 sim 1, user 3 disjoint → Σ_all = 3 + 2*1
    assert(approx(Personalization.upperTriangleMean(5.0, 3), 0.666666666666667, 1e-12))
  }
}
