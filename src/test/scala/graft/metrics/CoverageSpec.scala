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
}
