package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 batch-15 spec: Fellegi-Sunter linkage weights and scoring. */
class FellegiSunterSpec extends SparkTestBase {
  import spark.implicits._

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  test("fs weights: hand-computed m/u and weights on a labeled pair set") {
    // 4 matches (3 agree), 6 non-matches (1 agrees) on one field
    val pairs = (Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(5)((false, false)))
      .toDF("is_match", "f")
    val r = Linkage.fellegiSunterWeights(pairs, "is_match", Seq("f"))
      .collect().head
    assert(r.getString(0) == "f")
    assert(r.getLong(1) == 3L && r.getLong(2) == 4L) // m_cnt / m_tot
    assert(r.getLong(3) == 1L && r.getLong(4) == 6L) // u_cnt / u_tot
    // smoothed: m = 4/6, u = 2/8
    assert(r.getDouble(5) == math.rint(4.0 / 6 * 1e6) / 1e6)
    assert(r.getDouble(6) == 0.25)
    // w_agree = log2((4*8)/(2*6)) = log2(8/3)
    assert(r.getDouble(7) == math.rint(log2(32.0 / 12) * 1e6) / 1e6)
    // w_disagree = log2((2*8)/(6*6)) = log2(16/36)
    assert(r.getDouble(8) == math.rint(log2(16.0 / 36) * 1e6) / 1e6)
  }

  test("fs weights: a predictive field gets positive agree weight, an " +
      "anti-predictive one negative") {
    val rnd = new scala.util.Random(97)
    val pairs = (0 until 2000).map { _ =>
      val m = rnd.nextBoolean()
      // good: agrees 90% on matches, 10% off; bad: the inverse
      (m, rnd.nextDouble() < (if (m) 0.9 else 0.1),
        rnd.nextDouble() < (if (m) 0.1 else 0.9))
    }.toDF("is_match", "good", "bad")
    val w = Linkage.fellegiSunterWeights(pairs, "is_match",
      Seq("good", "bad")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(7), r.getDouble(8)))).toMap
    assert(w("good")._1 > 1.0 && w("good")._2 < -1.0)
    assert(w("bad")._1 < -1.0 && w("bad")._2 > 1.0)
  }

  test("fs score: equals the fixed-order sum of rounded weights") {
    val pairs = Seq(
      (1L, 2L, true, true, false),
      (1L, 3L, false, true, true),
      (2L, 3L, false, false, false)
    ).toDF("key_a", "key_b", "is_match", "f1", "f2")
    val w = Linkage.fellegiSunterWeights(pairs, "is_match", Seq("f1", "f2"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(7), r.getDouble(8)))).toMap
    val got = Linkage.fellegiSunterScore(pairs, Seq("key_a", "key_b"),
      "is_match", Seq("f1", "f2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    def exp(f1: Boolean, f2: Boolean): Double = {
      val s = (if (f1) w("f1")._1 else w("f1")._2) +
        (if (f2) w("f2")._1 else w("f2")._2)
      math.rint(s * 1e6) / 1e6
    }
    assert(got((1L, 2L)) == exp(f1 = true, f2 = false))
    assert(got((1L, 3L)) == exp(f1 = true, f2 = true))
    assert(got((2L, 3L)) == exp(f1 = false, f2 = false))
  }

  test("fs score: matches separate from non-matches on a seeded task") {
    val rnd = new scala.util.Random(101)
    val pairs = (0 until 3000).map { i =>
      val m = rnd.nextBoolean()
      (i.toLong, (i + 100000).toLong, m,
        rnd.nextDouble() < (if (m) 0.85 else 0.2),
        rnd.nextDouble() < (if (m) 0.7 else 0.15),
        rnd.nextDouble() < (if (m) 0.6 else 0.3))
    }.toDF("key_a", "key_b", "is_match", "f1", "f2", "f3")
    val rows = Linkage.fellegiSunterScore(pairs, Seq("key_a", "key_b"),
      "is_match", Seq("f1", "f2", "f3")).collect()
    val mScores = rows.filter(_.getBoolean(2)).map(_.getDouble(3))
    val uScores = rows.filterNot(_.getBoolean(2)).map(_.getDouble(3))
    assert(mScores.sum / mScores.length > uScores.sum / uScores.length + 1.0,
      "mean match score at least 1 bit above non-match")
  }
}
