package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkTestBase {
  import spark.implicits._

  test("dsirLogWeights: target-vocabulary docs score above off-target docs") {
    // two disjoint vocabularies; target = the 'en'-flagged half
    val en = "the quick brown fox jumps over the lazy dog"
    val de = "der schnelle braune fuchs springt ueber den faulen hund"
    val docs = (
      (0 until 10).map(j => (j.toLong, en, "en")) ++
      (10 until 20).map(j => (j.toLong, de, "de"))
    ).toDF("doc_id", "text", "lang")
    val w = Importance.dsirLogWeights(docs, "doc_id", "text",
        isTarget = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w(0L)._1 == 9L) // token count
    assert(w(0L)._2 > 0.0, s"target doc should have positive log-weight: ${w(0L)}")
    assert(w(15L)._2 < 0.0, s"off-target doc should be negative: ${w(15L)}")
    assert(w(0L)._2 > w(15L)._2)
    // all target docs share one text → one weight; same for off-target
    assert((0 until 10).map(j => w(j.toLong)._2).distinct.size == 1)
  }

  test("tokenBudgetSelect: greedy prefix equals the window formulation and " +
    "respects the budget") {
    val docs = Seq(
      (1L, 0.9, 30L), (2L, 0.8, 40L), (3L, 0.8, 50L), (4L, 0.7, 20L),
      (5L, 0.6, 100L), (6L, 0.5, 10L)
    ).toDF("doc_id", "score", "n_toks")
    val got = Importance.tokenBudgetSelect(docs, "doc_id", "score", "n_toks",
        budget = 120L)
      .orderBy(col("sel_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // greedy by (score desc, id): 1 (30), 2 (70), 3 (120) — 4 would hit 140
    assert(got.toSeq == Seq((1L, 1L, 30L), (2L, 2L, 70L), (3L, 3L, 120L)))
    // differential vs the single-window formulation on the same frame
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    val win = docs
      .withColumn("sel_rank", row_number().over(w))
      .withColumn("cum_tokens", sum(col("n_toks")).over(w))
      .filter(col("cum_tokens") <= 120L)
      .select(col("doc_id"), col("sel_rank"), col("cum_tokens"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    assert(got.toSeq == win.toSeq)
  }

  test("interleaveBySource: positions are a permutation and majority-source " +
    "runs are bounded by corpus share") {
    val docs = ((0 until 80).map(j => (j.toLong, "big")) ++
      (80 until 100).map(j => (j.toLong, "small"))).toDF("doc_id", "source")
    val out = Importance.interleaveBySource(docs, "doc_id", "source")
      .orderBy(col("position"))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.map(_._1).toSeq == (1L to 100L))
    // share 4:1 → runs of 'big' should never exceed ~share+1
    val runs = out.map(_._2).foldLeft(List.empty[(String, Int)]) {
      case ((s, n) :: t, cur) if s == cur => (s, n + 1) :: t
      case (acc, cur) => (cur, 1) :: acc
    }
    val maxBigRun = runs.filter(_._1 == "big").map(_._2).max
    assert(maxBigRun <= 6, s"big-source run too long: $maxBigRun")
    // every small doc is spread: gaps between consecutive 'small' positions
    val smallPos = out.filter(_._2 == "small").map(_._1)
    assert(smallPos.size == 20)
    val gaps = smallPos.zip(smallPos.tail).map { case (a, b) => b - a }
    assert(gaps.max <= 7, s"small docs cluster: max gap ${gaps.max}")
  }

  test("looSourceImpact: hand-computed counterfactual means and a " +
    "whole-corpus source yields null rest") {
    // a: lengths 10, 20 (mean 15); b: lengths 100 (mean 100).
    // pooled mean 130/3; without a -> 100, without b -> 15.
    val df = Seq(("a", 10L), ("a", 20L), ("b", 100L)).toDF("src", "len")
    val out = Importance.looSourceImpact(df, "src", "len")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val pooled = 130.0 / 3
    assert(out("a") == ((2L, 15.0, 100.0,
      math.round((100.0 - pooled) * 1e6) / 1e6)))
    assert(out("b")._3 == 15.0)
    assert(out("b")._4 < 0) // dropping the long source lowers the mean
    val solo = Importance.looSourceImpact(
      Seq(("only", 5L)).toDF("src", "len"), "src", "len").collect().head
    assert(solo.isNullAt(3) && solo.isNullAt(4))
  }
}
