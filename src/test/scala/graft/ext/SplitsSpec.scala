package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (0 until 300).map { i =>
    (i.toLong, if (i % 3 == 0) "web" else if (i % 3 == 1) "code" else "books")
  }.toDF("doc_id", "source") // 100 rows per source

  test("mixtureSample hits the target mixture, bounded by the scarcest source") {
    // target 50/30/20 over equal supplies of 100: web is scarcest relative to
    // its 50% share → m = floor(100e6/500000) = 200 → keep 100/60/40
    val w = Seq("web" -> 500000L, "code" -> 300000L, "books" -> 200000L)
    val kept = Splits.mixtureSample(corpus, "doc_id", "source", w)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("web" -> 100L, "code" -> 60L, "books" -> 40L))
  }

  test("mixtureSample drops unweighted groups and ignores absent weighted ones") {
    val w = Seq("web" -> 600000L, "code" -> 400000L, "nosuch" -> 1000L)
    val kept = Splits.mixtureSample(corpus, "doc_id", "source", w)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // m = min(floor(100e6/600000), floor(100e6/400000)) = 166 → 99 / 66
    assert(!kept.contains("books") && !kept.contains("nosuch"))
    assert(kept == Map("web" -> 99L, "code" -> 66L))
  }

  test("mixtureSampleApprox: counts within binomial noise of exact quotas, zero sorts") {
    val big = (0 until 6000).map { i =>
      (i.toLong, if (i % 3 == 0) "web" else if (i % 3 == 1) "code" else "books")
    }.toDF("doc_id", "source") // 2000 per source
    val w = Seq("web" -> 500000L, "code" -> 300000L, "books" -> 200000L)
    // exact quotas: m = 4000000/... → web 2000, code 1200, books 800
    val quotas = Map("web" -> 2000.0, "code" -> 1200.0, "books" -> 800.0)
    val kept = Splits.mixtureSampleApprox(big, "doc_id", "source", w)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    quotas.foreach { case (g, q) =>
      val rate = q / 2000.0
      val sigma = math.sqrt(rate * (1 - rate) * 2000.0)
      assert(math.abs(kept(g) - q) <= math.max(4 * sigma, 1.0),
        s"$g: kept ${kept(g)} vs quota $q (sigma $sigma)")
    }
    // scan-side decision: no window/sort in the plan
    val plan = Splits.mixtureSampleApprox(big, "doc_id", "source", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"expected sort-free plan:\n${plan.take(1500)}")
    // and the draw is repartition-stable
    val a = Splits.mixtureSampleApprox(big, "doc_id", "source", w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Splits.mixtureSampleApprox(big.repartition(11), "doc_id", "source", w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("mixtureSample draws identical rows regardless of partitioning") {
    val w = Seq("web" -> 500000L, "code" -> 300000L, "books" -> 200000L)
    val a = Splits.mixtureSample(corpus, "doc_id", "source", w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Splits.mixtureSample(corpus.repartition(13), "doc_id", "source", w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 200)
  }

  test("weightedSample: heavier rows are sampled more often; draw is stable") {
    import spark.implicits._
    // two weight classes: 100 heavy (w=50) vs 400 light (w=1); a 100-row
    // weighted draw should be dominated by heavy rows (E-S: P(select) ∝ w)
    val df = (0 until 500)
      .map(i => (i.toLong, if (i < 100) 50 else 1))
      .toDF("doc_id", "w")
    val picked = Splits.weightedSample(df, "doc_id", "w", n = 100)
      .collect().map(_.getLong(0)).toSet
    val heavy = picked.count(_ < 100)
    assert(heavy > 80, s"heavy class underrepresented: $heavy/100")
    // deterministic under repartitioning
    val again = Splits.weightedSample(df.repartition(7), "doc_id", "w", n = 100)
      .collect().map(_.getLong(0)).toSet
    assert(again == picked)
  }

  test("leaveOneOutSplit: exactly one test row per key, and it is the latest") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 20L, 3L), // tie on ts → event 3 wins
      (2L, 5L, 4L)
    ).toDF("user_id", "ms", "event_id")
    val out = Splits.leaveOneOutSplit(df, "user_id", "ms", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val test = out.filter(_._3 == "test")
    assert(test.toSet == Set((1L, 3L, "test"), (2L, 4L, "test")))
    assert(out.count(_._3 == "train") == 2)
    // leakage-free: every train row's ts <= its key's test row ts
    val testTs = Map(1L -> 20L, 2L -> 5L)
    val byId = Map(1L -> 10L, 2L -> 20L, 3L -> 20L, 4L -> 5L)
    out.filter(_._3 == "train").foreach { case (u, eid, _) =>
      assert(byId(eid) <= testTs(u))
    }
  }
}
