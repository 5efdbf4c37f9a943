package graft.metrics

import graft.SparkTestBase

class CoverageSpec extends SparkTestBase {
  import spark.implicits._

  test("fraction of catalog covered by recommendations") {
    val recs = Seq(1, 2, 2, 3).toDF("item")
    val catalog = (1 to 10).toDF("id")
    assert(approx(Coverage.coverage(recs, catalog, "item", "id"), 0.3))
  }

  test("coverage honors the column parameters (ref bug fixed, §2.4.1)") {
    val recs = Seq(("a", 1), ("b", 2)).toDF("other", "my_item")
    val catalog = Seq(1, 2, 3, 4).toDF("cat_item")
    assert(approx(Coverage.coverage(recs, catalog, "my_item", "cat_item"), 0.5))
  }

  test("DF form carries counts and rounded ratio") {
    val recs = Seq(1, 2, 3).toDF("item")
    val catalog = (1 to 3).toDF("id")
    val r = Coverage.coverageDF(recs, catalog, "item", "id").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && approx(r.getDouble(2), 1.0))
  }

  test("approxCoverage tracks the exact ratio within HLL error and its plan " +
    "has no exact-distinct expand") {
    val recs = (1 to 3000).filter(_ % 3 != 0).toDF("item")
    val catalog = (1 to 3000).toDF("id")
    val exact = Coverage.coverage(recs, catalog, "item", "id")
    val est = Coverage.approxCoverage(recs, catalog, "item", "id", rsd = 0.02)
    // numerator and denominator each carry ~2% rsd; 10% absolute slack is
    // ~2.5 combined sigmas on a ratio near 2/3
    assert(math.abs(est - exact) <= 0.1 * exact,
      s"approx $est vs exact $exact")
    // the sketch path must plan an HLL++ aggregate, not countDistinct
    val plan = recs.agg(
      org.apache.spark.sql.functions.approx_count_distinct(
        org.apache.spark.sql.functions.col("item"), 0.02))
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct") && !plan.contains("Expand"))
  }
}
