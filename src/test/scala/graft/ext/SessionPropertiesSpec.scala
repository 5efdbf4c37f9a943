package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for this round's later operator batches —
  * invariants that hold for EVERY input, on generated data with fixed seeds
  * (the Round8PropertiesSpec convention).
  */
class SessionPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // --- kendallTau: range, perfect self-agreement, antisymmetry -------------

  private val xyGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(3, 40)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 50L)))
  } yield rows

  test("kendallTau: |tau| <= 1 always; tau(x, x) = 1 on distinct values; " +
    "negating y negates tau") {
    (1 to 6).foreach { seed =>
      val rows = sample(xyGen, seed).zipWithIndex
        .map { case ((x, y), i) => (s"k$i", x, y) }
      val df = rows.toDF("k", "x", "y")
      val t = RankCompare.kendallTau(df, "k", "x", "y").collect().head
      if (!t.isNullAt(5)) {
        val tau = t.getDouble(5)
        assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9, s"seed $seed: $tau")
        val neg = RankCompare.kendallTau(
          df.select(col("k"), col("x"), (-col("y")).as("y")), "k", "x", "y")
          .collect().head.getDouble(5)
        assert(math.abs(neg + tau) < 2e-6, s"seed $seed: $tau vs $neg")
      }
      val self = RankCompare.kendallTau(
        rows.zipWithIndex.map { case ((k, x, _), i) => (k, x + i * 100, x + i * 100) }
          .toDF("k", "x", "y"), "k", "x", "y").collect().head
      assert(self.getDouble(5) == 1.0)
    }
  }

  // --- isotonicFit: monotone output, mean preservation, idempotence --------

  private val bucketsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 25)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 20L), Gen.choose(1L, 30L)))
  } yield rows // (pos-seed, n); pos clamped to n below

  test("isotonicFit: output is monotone, preserves the weighted mean, and " +
    "is idempotent (fitting the fit changes nothing)") {
    (1 to 6).foreach { seed =>
      val rows = sample(bucketsGen, seed).zipWithIndex.map {
        case ((p, n), i) => ("g", i.toLong, math.min(p, n), n)
      }
      val fit = Isotonic.isotonicFit(rows.toDF("g", "x", "pos", "n"),
          "g", "x", "pos", "n")
        .collect().sortBy(_.getLong(1))
      val iso = fit.map(_.getDouble(5))
      assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-12 },
        s"seed $seed not monotone: ${iso.toSeq}")
      val wMeanIn = rows.map(_._3).sum.toDouble / rows.map(_._4).sum *
        rows.map(_._4).sum
      val wMeanOut = fit.map(r => r.getDouble(5) * r.getLong(3)).sum
      assert(math.abs(wMeanOut - wMeanIn) < 1e-4 * math.max(1.0, wMeanIn),
        s"seed $seed: mass $wMeanOut vs $wMeanIn")
      // idempotence: feed the fitted rates back (scaled to integers)
      val refit = Isotonic.isotonicFit(
          fit.map(r => ("g", r.getLong(1),
            math.round(r.getDouble(5) * 1000000) * r.getLong(3), // pos'
            1000000L * r.getLong(3))).toSeq.toDF("g", "x", "pos", "n"),
          "g", "x", "pos", "n")
        .collect().sortBy(_.getLong(1)).map(_.getDouble(5))
      fit.map(_.getDouble(5)).zip(refit).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5, s"seed $seed: $a refit to $b")
      }
    }
  }

  // --- winsorizedMean: bounded by min/max, invariant under outliers --------

  private val valsGen: Gen[List[Long]] = for {
    n <- Gen.choose(10, 60)
    rows <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
  } yield rows

  test("winsorizedMean is within [min, max] and unchanged when the single " +
    "largest value is inflated arbitrarily (k >= 1)") {
    (1 to 6).foreach { seed =>
      val vals = sample(valsGen, seed)
      def mean(vs: Seq[Long]): Double = {
        val df = vs.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
          .toDF("g", "v", "id")
        Profiling.winsorizedMean(df, "g", "v", "id").collect().head.getDouble(4)
      }
      val m = mean(vals)
      assert(m >= vals.min - 1e-9 && m <= vals.max + 1e-9)
      val maxIdx = vals.indexOf(vals.max)
      val inflated = vals.updated(maxIdx, 1000000000L)
      assert(mean(inflated) == m,
        s"seed $seed: inflating the clamped max must not move the mean")
    }
  }

  // --- mannKendall: S antisymmetry and bounds ------------------------------

  test("mannKendall: negating the series negates S; |S| <= n(n-1)/2") {
    (1 to 6).foreach { seed =>
      val vals = sample(valsGen, seed).take(25)
      def mk(vs: Seq[Long]) = ChangeDetect.mannKendall(
        vs.zipWithIndex.map { case (v, i) => ("g", f"2024-01-${i + 1}%02d", v) }
          .toDF("g", "d", "v")
          .select(col("g"), col("d").cast("date").as("d"),
            col("v").cast("decimal(38,0)").as("v")),
        "g", "d", "v").collect().head
      val fwd = mk(vals)
      val rev = mk(vals.map(-_))
      assert(fwd.getLong(2) == -rev.getLong(2), s"seed $seed S antisymmetry")
      val n = vals.length.toLong
      assert(math.abs(fwd.getLong(2)) <= n * (n - 1) / 2)
      assert(fwd.getDouble(3) == rev.getDouble(3), "variance is sign-blind")
    }
  }
}
