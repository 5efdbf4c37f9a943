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

  test("mixtureSample draws identical rows regardless of partitioning") {
    val w = Seq("web" -> 500000L, "code" -> 300000L, "books" -> 200000L)
    val a = Splits.mixtureSample(corpus, "doc_id", "source", w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Splits.mixtureSample(corpus.repartition(13), "doc_id", "source", w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 200)
  }
}
