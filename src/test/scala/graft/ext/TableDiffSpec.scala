package graft.ext

import graft.SparkTestBase

class TableDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def oldV = Seq(
    (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, Some("c"), 30),
    (4L, None, 40)
  ).toDF("id", "name", "score")

  test("diff classifies added / removed / changed and drops unchanged") {
    val newV = Seq(
      (1L, Some("a"), 10),   // unchanged
      (2L, Some("B!"), 20),  // changed
      (4L, None, 40),        // unchanged (null survives fingerprinting)
      (5L, Some("e"), 50)    // added; 3 removed
    ).toDF("id", "name", "score")
    val out = TableDiff.diff(oldV, newV, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
  }

  test("diff: null vs the string 'null' are different rows") {
    val a = Seq((1L, Option.empty[String])).toDF("id", "v")
    val b = Seq((1L, Option("null"))).toDF("id", "v")
    val out = TableDiff.diff(a, b, "id").collect()
    assert(out.length == 1 && out.head.getString(1) == "changed")
  }

  test("diff: column-boundary shifts don't collide (separator discipline)") {
    val a = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val b = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val out = TableDiff.diff(a, b, "id").collect()
    assert(out.length == 1 && out.head.getString(1) == "changed")
  }

  test("diffSummary counts every class") {
    val newV = Seq(
      (1L, Some("a"), 10), (2L, Some("B!"), 20), (5L, Some("e"), 50),
      (4L, None, 40)
    ).toDF("id", "name", "score")
    val s = TableDiff.diffSummary(oldV, newV, "id").collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ==
      ((1L, 1L, 1L, 2L)))
  }
}
