package graft.ext

import graft.SparkTestBase

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("spanDedup: duplicate spans keep only the first occurrence") {
    // span size 2: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [c d]
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d")
    ).toDF("doc_id", "text")
    val out = SpanDedup.spanDedup(docs, "doc_id", "text", spanWords = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 1L, 0L, "")))
  }

  test("spanDedup: within-doc repetition also deduplicates") {
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = SpanDedup.spanDedup(docs, "doc_id", "text", spanWords = 2)
      .as[(Long, Long, Long, String)].collect().head
    assert(out == ((1L, 3L, 1L, "a b")))
  }

  test("spanDedup: reassembly preserves original span order") {
    val docs = Seq(
      (1L, "z z"),
      (2L, "p q r s t u v w x y z1 z2") // spans [p q][r s]...[z1 z2], none dup
    ).toDF("doc_id", "text")
    val out = SpanDedup.spanDedup(docs, "doc_id", "text", spanWords = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(1)._4 == "p q r s t u v w x y z1 z2")
  }

  test("spanDedup: trailing partial span is its own span") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = SpanDedup.spanDedup(docs, "doc_id", "text", spanWords = 2)
      .as[(Long, Long, Long, String)].collect().head
    assert(out == ((1L, 2L, 2L, "a b c")))
  }

  test("spanDedup: no window operator in the plan (hot spans stay aggregated)") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val plan = SpanDedup.spanDedup(docs, "doc_id", "text", spanWords = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"min-struct agg expected, not a window:\n${plan.take(600)}")
  }
}
