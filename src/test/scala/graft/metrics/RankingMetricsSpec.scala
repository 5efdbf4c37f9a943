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
}
