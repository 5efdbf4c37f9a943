package graft.metrics

import graft.SparkTestBase

/** Golden tests on the exact reference-derived fixtures from FIXTURES.md §A —
  * the notebook's `ex_preds`/`pops` corpus (usage_examples.ipynb cells 64-79) run
  * through every novelty formulation, and the personalization doctest.
  */
class ReferenceFixturesSpec extends SparkTestBase {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  // ex_preds (cell 64): 4 users' recommendation lists
  private val exPreds = Seq(
    Seq("a", "b", "c"), Seq("d", "e", "f"), Seq("a", "b", "f"), Seq("d", "e", "c"))
  // pops (cell 72): item → popularity count
  private val pops = Map("a" -> 8L, "b" -> 3L, "c" -> 1L, "d" -> 4L, "e" -> 7L,
    "f" -> 6L, "g" -> 7L)

  private def recsDf = exPreds.zipWithIndex
    .flatMap { case (items, u) => items.map(i => (u, i)) }.toDF("person", "product")
  // sales: product k appears once per person 0..v-1 → popularity v, 8 distinct persons
  private def salesDf = pops.toSeq
    .flatMap { case (item, v) => (0L until v).map(p => (p, item)) }.toDF("person", "product")

  private def expectedMsi(items: Seq[String], u: Double, div: Int) =
    items.map(i => -log2(pops(i) / u)).sum / div

  test("novelty_refac golden (u=10, n=3) — cells 73-74") {
    val (mean, perUser) = Novelty.noveltyRefac(exPreds, pops, u = 10L, n = 3)
    val expected = exPreds.map(l => expectedMsi(l, 10.0, 3))
    perUser.zip(expected).foreach { case (got, exp) => assert(approx(got, exp)) }
    assert(approx(mean, expected.sum / 4))
  }

  test("distributed novelty agrees with refac on equal-length lists (u=10)") {
    val (mean, perUser) = Novelty.novelty(salesDf, recsDf, u = Some(10L))
    val (refMean, refPerUser) = Novelty.noveltyRefac(exPreds, pops, u = 10L, n = 3)
    assert(approx(mean, refMean), s"$mean vs $refMean")
    perUser.zip(refPerUser).foreach { case (a, b) => assert(approx(a, b)) }
  }

  test("u defaults to 8 distinct persons in sales (cells 78-79)") {
    val (mean, _) = Novelty.novelty(salesDf, recsDf)
    val expected = exPreds.map(l => expectedMsi(l, 8.0, 3)).sum / 4
    assert(approx(mean, expected), s"$mean vs $expected")
  }

  test("§2.4.2 null case: an item absent from sales deflates by COUNT(*)") {
    val recsWithZ = (recsDf.as[(Int, String)].collect().toSeq :+ ((0, "z")))
      .toDF("person", "product")
    val out = Novelty.perUserMsi(salesDf, recsWithZ, u = Some(10L))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // user 0 now has 4 rows, z contributes null → sum over {a,b,c} / 4
    assert(approx(out(0), expectedMsi(Seq("a", "b", "c"), 10.0, 4)))
  }

  test("personalization doctest golden across both engines (0.666666666666667)") {
    val pairs = Seq((1, 1), (1, 2), (2, 2), (2, 1), (3, 3), (3, 4))
      .toDF("cod_pessoa", "cod_ean")
    assert(approx(Personalization.personalization(pairs, "cod_pessoa", "cod_ean"),
      0.666666666666667, 1e-12))
    assert(approx(Personalization.personalizationDimsum(pairs, "cod_pessoa", "cod_ean"),
      0.666666666666667, 1e-9))
  }
}
