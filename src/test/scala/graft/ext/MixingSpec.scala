package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MixingSpec extends SparkTestBase {
  import spark.implicits._

  test("quantileNormalize: two sources with shifted scales land on the " +
    "common pooled scale") {
    // source a: 10,20,30; source b: 1000,2000,3000. Pooled sorted:
    // 10,20,30,1000,2000,3000 (N=6). Rank r of 3 maps to pooled index
    // 1 + (r-1)*5 div 2 → 1, 3, 6 → values 10, 30, 3000 for BOTH sources.
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 1000L), ("b", 5L, 2000L), ("b", 6L, 3000L))
      .toDF("src", "id", "v")
    val out = Mixing.quantileNormalize(df, "src", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 10L && out(2L) == 30L && out(3L) == 3000L)
    assert(out(4L) == 10L && out(5L) == 30L && out(6L) == 3000L)
  }

  test("quantileNormalize: a singleton source maps to the pooled median") {
    val df = Seq(("big", 1L, 1L), ("big", 2L, 2L), ("big", 3L, 3L),
      ("big", 4L, 4L), ("solo", 9L, 999L)).toDF("src", "id", "v")
    // N=5, singleton index = (5-1) div 2 + 1 = 3 → third-smallest value 3
    val out = Mixing.quantileNormalize(df, "src", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(9L) == 3L)
  }

  test("quantileNormalize: within-source ordering is preserved (monotone)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(i =>
      (s"s${i % 3}", i.toLong, rnd.nextInt(1000).toLong))
    val out = Mixing.quantileNormalize(rows.toDF("src", "id", "v"),
        "src", "v", "id")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(r => (r._2, r._3))
      assert(sorted.map(_._3).sliding(2)
        .forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("temperatureWeights: alpha=1 recovers raw shares, alpha<1 upweights " +
    "small sources") {
    val docs = Seq.fill(90)(("big", 10L)) ++ Seq.fill(10)(("small", 10L))
    val df = docs.toDF("src", "sz")
    val at1 = Mixing.temperatureWeights(df, "src", "sz", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(approx(at1("big"), 0.9, 1e-6) && approx(at1("small"), 0.1, 1e-6))
    val at03 = Mixing.temperatureWeights(df, "src", "sz", alpha = 0.3)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(at03("small") > 0.1 && at03("big") < 0.9)
    assert(approx(at03("small") + at03("big"), 1.0, 1e-6))
  }

  test("unimaxAllocation: mixed capped/uncapped waterfill — capped sources " +
    "take their capacity, the rest split the remainder evenly") {
    // unique tokens 10/20/30/100, epochCap 2 → caps 20/40/60/200.
    // B=300: ranks 1..3 capped (20+40+60=120), source d gets 300-120=180.
    val docs = (Seq.fill(1)(("a", 10L)) ++ Seq.fill(2)(("b", 10L)) ++
      Seq.fill(3)(("c", 10L)) ++ Seq.fill(10)(("d", 10L))).toDF("src", "sz")
    val out = Mixing.unimaxAllocation(docs, "src", "sz", budget = 300L,
        epochCap = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out("a") == ((20L, true, 20.0, 2.0)))
    assert(out("b") == ((40L, true, 40.0, 2.0)))
    assert(out("c") == ((60L, true, 60.0, 2.0)))
    assert(out("d") == ((200L, false, 180.0, 1.8)))
  }

  test("unimaxAllocation: tight budget — only the smallest source caps, " +
    "everyone else shares the waterline") {
    // caps 20/40/60/200, B=100: rank 1 capped (20·4=80 ≤ 100); rank 2 is
    // not (40·3=120 > 80). Waterline = (100-20)/3 = 26.666667.
    val docs = Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 100L))
      .toDF("src", "sz")
    val out = Mixing.unimaxAllocation(docs, "src", "sz", budget = 100L,
        epochCap = 2)
      .collect().map(r => r.getString(0) -> (r.getBoolean(3), r.getDouble(4)))
      .toMap
    assert(out("a") == ((true, 20.0)))
    assert(out("b")._1 == false && approx(out("b")._2, 26.666667, 1e-6))
    assert(approx(out("c")._2, 26.666667, 1e-6))
    assert(approx(out("d")._2, 26.666667, 1e-6))
    // allocations exhaust the budget
    val total = out.values.map(_._2).sum
    assert(approx(total, 100.0, 1e-5))
  }

  test("effectiveData: no repeats passes through; R=1 matches the " +
    "closed form U + U·R*·(1−exp(−1/R*))") {
    val alloc = Seq(("fresh", 100L, 80.0), ("twice", 100L, 200.0))
      .toDF("source", "n_tokens", "allocated")
    val out = Mixing.effectiveData(alloc, "source", "n_tokens", "allocated",
        rStar = 15.4)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out("fresh") == ((0.0, 80.0, 1.0)))
    val expected = 100.0 + 100.0 * 15.4 * (1.0 - math.exp(-1.0 / 15.4))
    assert(approx(out("twice")._1, 1.0, 1e-9))
    assert(approx(out("twice")._2, expected, 1e-4))
    assert(out("twice")._3 < 1.0)
  }

  test("shuffleQuality: a perfectly interleaved order scores chi2 = 0, a " +
    "source-clumped order blows max_chi2 past the df scale") {
    // 4 sources × 40 docs, chunk size 8: interleaved = every chunk has the
    // exact 2/2/2/2 mix; clumped = each chunk is single-source
    val interleaved = (0 until 160).map(i => (i.toLong, s"s${i % 4}"))
    val clumped = (0 until 160).map(i => (i.toLong, s"s${i / 40}"))
    val good = Mixing.shuffleQuality(interleaved.toDF("ord", "src"),
      "ord", "src", chunkSize = 8).collect().head
    assert(good.getLong(0) == 20 && good.getLong(1) == 4)
    assert(good.getDouble(3) == 0.0 && good.getDouble(4) == 0.0)
    val bad = Mixing.shuffleQuality(clumped.toDF("ord", "src"),
      "ord", "src", chunkSize = 8).collect().head
    // a single-source chunk of n=8 in a uniform-4 mix: chi2 = 3·8 = 24
    assert(bad.getDouble(3) == 24.0 && bad.getDouble(4) == 24.0)
  }
}
