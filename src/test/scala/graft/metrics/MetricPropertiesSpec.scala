package graft.metrics

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5): bounds, invariance under relabeling,
  * monotonicity — checked over ScalaCheck-generated interaction tables with fixed
  * seeds (deterministic; scalatestplus bridge isn't on the offline classpath).
  */
class MetricPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val pairsGen: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(4, 40)
    pairs <- Gen.listOfN(n, Gen.zip(Gen.choose(1, 6), Gen.choose(1, 10)))
  } yield pairs

  private def samples(count: Int): Seq[List[(Int, Int)]] =
    (1 to count).flatMap(i => pairsGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("coverage ∈ [0,1] whenever recommendations ⊆ catalog") {
    samples(5).foreach { pairs =>
      val recs = pairs.toDF("u", "i")
      val catalog = (1 to 10).toDF("i")
      val c = Coverage.coverage(recs, catalog, "i", "i")
      assert(c >= 0.0 && c <= 1.0, s"coverage $c for $pairs")
    }
  }

  test("personalization ∈ [0,1] (±ulp) and is user-relabeling invariant") {
    samples(4).filter(_.map(_._1).distinct.size >= 2).foreach { pairs =>
      val p = Personalization.personalization(pairs.toDF("u", "i"), "u", "i")
      assert(p >= -1e-9 && p <= 1.0 + 1e-9, s"p=$p for $pairs")
      val relabeled = pairs.map { case (u, i) => (u + 100, i) }.toDF("u", "i")
      val p2 = Personalization.personalization(relabeled, "u", "i")
      assert(approx(p, p2, 1e-9), s"$p vs relabeled $p2")
    }
  }

  test("novelty: msi ≥ 0 when u ≥ max popularity, and item-relabeling invariant") {
    samples(4).foreach { pairs =>
      val recsPairs = pairs.take(math.max(pairs.size / 2, 1))
      val (mean, _) = Novelty.novelty(pairs.toDF("person", "product"),
        recsPairs.toDF("person", "product"), u = Some(1000L))
      assert(mean >= -1e-9, s"mean=$mean") // pop/u ≤ 1 → -log2 ≥ 0
      val (meanR, _) = Novelty.novelty(
        pairs.map { case (u, i) => (u, i + 500) }.toDF("person", "product"),
        recsPairs.map { case (u, i) => (u, i + 500) }.toDF("person", "product"),
        u = Some(1000L))
      assert(approx(mean, meanR, 1e-9))
    }
  }

  test("long-tail: cumulative volume is monotone and pct ends at exactly 1.0") {
    samples(5).foreach { pairs =>
      val rows = LongTail.longTailDF(pairs.toDF("u", "item"), "item")
        .orderBy("rank").collect()
      val cums = rows.map(_.getLong(3))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      assert(approx(rows.last.getDouble(4), 1.0, 1e-12))
      assert(cums.last == pairs.size.toLong)
    }
  }
}
