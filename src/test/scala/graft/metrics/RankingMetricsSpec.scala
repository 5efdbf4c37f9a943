package graft.metrics

import graft.SparkTestBase

class RankingMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def recs = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L), // user 1: 3 recs, 2 hits
    (2L, 20L),                       // user 2: 1 rec, 0 hits
    (3L, 30L), (3L, 30L)             // user 3: dup rec collapses to 1, 1 hit
  ).toDF("user_id", "item_id")

  private def actuals = Seq(
    (1L, 10L), (1L, 12L), (1L, 99L), // user 1: 3 actuals
    (3L, 30L),                       // user 3
    (4L, 40L)                        // user 4: actuals only, no recs
  ).toDF("user_id", "item_id")

  test("precisionRecall: hits, denominators, and null semantics") {
    val out = RankingMetrics.precisionRecall(recs, actuals, "user_id", "item_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((3L, 3L, 2L, Some(0.666667), Some(0.666667))))
    assert(out(2L) == ((1L, 0L, 0L, Some(0.0), None))) // no actuals → recall null
    assert(out(3L) == ((1L, 1L, 1L, Some(1.0), Some(1.0))))
    assert(out(4L) == ((0L, 1L, 0L, None, Some(0.0)))) // no recs → precision null
  }

  test("meanReciprocalRank: frequency-ranked first hits") {
    // user 1 ranked: all count 1 → order by item: 10, 11, 12; first hit = 10 → 1/1
    // user 2: no hit → 0; user 3: 30 (count 2) rank 1 → 1/1
    val out = RankingMetrics.meanReciprocalRank(recs, actuals, "user_id", "item_id")
      .collect().head
    assert(out.getLong(0) == 3L) // users with recs
    assert(out.getLong(1) == 2L)
    assert(math.abs(out.getDouble(2) - (1.0 + 0.0 + 1.0) / 3) < 1e-6)
  }

  test("ndcgAtK: perfect ranking → 1, miss → 0, partial in between") {
    // user 1: recs (by item order) 10, 11, 12; actuals 10, 12
    //   dcg  = 1/log2(2) + 1/log2(4) = 1 + 0.5 = 1.5
    //   idcg = 1/log2(2) + 1/log2(3)
    val out = RankingMetrics.ndcgAtK(recs, actuals, "user_id", "item_id", k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val idcg1 = 1.0 + math.log(2) / math.log(3)
    val (n1, d1, i1, nd1) = out(1L)
    assert(n1 == 3L) // actuals 10, 12, 99
    val expIdcg1 = 1.0 + math.log(2) / math.log(3) + math.log(2) / math.log(4)
    assert(math.abs(i1 - expIdcg1) < 1e-5, s"idcg $i1 vs $expIdcg1")
    assert(math.abs(d1 - 1.5) < 1e-5)
    assert(math.abs(nd1 - 1.5 / expIdcg1) < 1e-5)
    // user 3: single rec is the single actual → perfect
    assert(math.abs(out(3L)._4 - 1.0) < 1e-9)
    // user 4 has actuals but no recs → ndcg 0
    assert(out(4L)._4 == 0.0)
    // user 2 has recs but no actuals → absent (no idcg denominator)
    assert(!out.contains(2L))
    assert(idcg1 > 0) // silence unused warning path
  }

  test("meanReciprocalRank: rank ordering respects frequency before item id") {
    // user 1 recommends item 5 twice (rank 1) and item 1 once (rank 2);
    // only item 1 is an actual → first hit at rank 2 → mrr = 0.5
    val r = Seq((1L, 5L), (1L, 5L), (1L, 1L)).toDF("user_id", "item_id")
    val a = Seq((1L, 1L)).toDF("user_id", "item_id")
    val out = RankingMetrics.meanReciprocalRank(r, a, "user_id", "item_id")
      .collect().head
    assert(out.getDouble(2) == 0.5)
  }

  test("mapAtK: hand-computed average precision") {
    // user 1 recs ranked: 5 (freq 2), then 1, then 9; actuals {1, 9, 7}
    //   hits at ranks 2 (cum 1) and 3 (cum 2)
    //   AP = (1/2 + 2/3) / min(10, 3) = (0.5 + 0.666667) / 3
    val r = Seq((1L, 5L), (1L, 5L), (1L, 1L), (1L, 9L)).toDF("user_id", "item_id")
    val a = Seq((1L, 1L), (1L, 9L), (1L, 7L), (2L, 4L)).toDF("user_id", "item_id")
    val out = RankingMetrics.mapAtK(r, a, "user_id", "item_id", k = 10)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    val (nAct, nHits, ap) = out(1L)
    assert(nAct == 3L && nHits == 2L)
    assert(math.abs(ap - (0.5 + 2.0 / 3) / 3) < 1e-5)
    // user 2 has actuals but no recs -> AP 0
    assert(out(2L) == ((1L, 0L, 0.0)))
  }

  test("mapAtK: ranks beyond k do not contribute") {
    // 4 recs, k=2: the only hit sits at rank 3 -> AP@2 = 0
    val r = Seq((1L, 1L), (1L, 1L), (1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L),
      (1L, 4L)).toDF("user_id", "item_id")
    val a = Seq((1L, 3L)).toDF("user_id", "item_id")
    val out = RankingMetrics.mapAtK(r, a, "user_id", "item_id", k = 2)
      .collect().head
    assert(out.getDouble(3) == 0.0)
  }

  test("hitRateAtK: counts users with a top-k hit and averages 1/first-hit") {
    // u1: first hit rank 2; u2: no hit; u3: hit rank 1
    val r = Seq((1L, 5L), (1L, 5L), (1L, 1L), (2L, 7L), (3L, 4L))
      .toDF("user_id", "item_id")
    val a = Seq((1L, 1L), (3L, 4L), (9L, 9L)).toDF("user_id", "item_id")
    val out = RankingMetrics.hitRateAtK(r, a, "user_id", "item_id", k = 10)
      .collect().head
    assert(out.getAs[Long]("n_users") == 3L)
    assert(out.getAs[Long]("n_users_hit") == 2L)
    assert(math.abs(out.getAs[Double]("arhr") - (0.5 + 1.0) / 3) < 1e-5)
  }

  test("serendipity: popular hits are excluded, unexpected hits kept") {
    // items 1, 2 are the top-2 popular actuals; with topN = 2 a hit on item 1
    // is expected, a hit on item 30 is serendipitous
    val a = (1L to 10L).map(u => (u, 1L)) ++ (1L to 9L).map(u => (u, 2L)) ++
      Seq((1L, 30L), (2L, 31L))
    val r = Seq((1L, 1L), (1L, 30L), (1L, 99L), (2L, 2L))
    val out = RankingMetrics.serendipity(r.toDF("user_id", "item_id"),
        a.toDF("user_id", "item_id"), "user_id", "item_id", topN = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(out(1L) == ((3L, 2L, 1L))) // hits: item 1 (popular) + item 30 (serendip)
    assert(out(2L) == ((1L, 1L, 0L))) // hit on popular item 2 only
  }

  test("calibrationOverlap: identical mixes -> 1, disjoint -> 0") {
    val h = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (3L, "x"))
      .toDF("user_id", "feat")
    val r = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b"), (4L, "y"))
      .toDF("user_id", "feat")
    val out = RankingMetrics.calibrationOverlap(h, r, "user_id", "feat")
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("overlap")).toMap
    assert(approx(out(1L), 1.0, 1e-6))   // same 2/3-1/3 mix
    assert(approx(out(2L), 0.0, 1e-6))   // disjoint features
    assert(!out.contains(3L) && !out.contains(4L)) // one-sided users excluded
  }

  test("calibrationOverlap: partial overlap is the min-share sum") {
    // hist: a 3/4, b 1/4; recs: a 1/2, c 1/2 -> overlap = min(3/4,1/2) = 0.5
    val h = Seq((1L, "a"), (1L, "a"), (1L, "a"), (1L, "b")).toDF("user_id", "feat")
    val r = Seq((1L, "a"), (1L, "c")).toDF("user_id", "feat")
    val out = RankingMetrics.calibrationOverlap(h, r, "user_id", "feat")
      .collect().head
    assert(approx(out.getAs[Double]("overlap"), 0.5, 1e-6))
  }

  test("errAtK: cascade discount — a hit below an earlier hit contributes " +
    "half as much as it would standalone") {
    // user 1 recs ranked a(3×), b(2×), c(1×); actuals {a, c}:
    // ERR = 0.5/1 + (0.5·0.5)/3 = 0.583333. user 2: no hits → 0.
    val recs = (Seq.fill(3)((1L, "a")) ++ Seq.fill(2)((1L, "b")) ++
      Seq((1L, "c"), (2L, "x"))).toDF("user_id", "item_id")
    val actuals = Seq((1L, "a"), (1L, "c"), (9L, "z")).toDF("user_id", "item_id")
    val out = RankingMetrics.errAtK(recs, actuals, "user_id", "item_id", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 2L && approx(out(1L)._2, 0.583333, 1e-6))
    assert(out(2L) == ((0L, 0.0)))
  }

  test("errAtK is bounded by MRR's reciprocal first-hit rank and respects k") {
    // hit only at rank 3 of 3: ERR = 0.5/3 = 0.166667; with k=2 it vanishes
    val recs = (Seq.fill(3)((1L, "a")) ++ Seq.fill(2)((1L, "b")) ++
      Seq((1L, "c"))).toDF("user_id", "item_id")
    val actuals = Seq((1L, "c")).toDF("user_id", "item_id")
    val at10 = RankingMetrics.errAtK(recs, actuals, "user_id", "item_id", 10)
      .collect().head
    assert(approx(at10.getDouble(2), 0.166667, 1e-6))
    val at2 = RankingMetrics.errAtK(recs, actuals, "user_id", "item_id", 2)
      .collect().head
    assert(at2.getLong(1) == 0L && at2.getDouble(2) == 0.0)
  }
}
