package graft.ext

import graft.SparkTestBase

class RankCompareSpec extends SparkTestBase {
  import spark.implicits._

  private def ranked(ids: Seq[Long]) =
    ids.zipWithIndex.map { case (id, i) => (id, i + 1) }.toDF("item", "rnk")

  test("identical rankings give rbo = 1 - p^D (truncated mass)") {
    val a = ranked(Seq(1L, 2L, 3L, 4L))
    val out = RankCompare.rbo(a, a, "item", "rnk", depth = 4, p = 0.5)
      .collect().head
    // overlap at every depth d is d → each term is p^{d-1}; (1-p)Σ = 1 - p^D
    assert(out.getLong(0) == 4L && out.getLong(1) == 4L)
    assert(approx(out.getDouble(2), 1.0 - math.pow(0.5, 4), 1e-9))
  }

  test("disjoint rankings give rbo = 0") {
    val out = RankCompare.rbo(ranked(Seq(1L, 2L)), ranked(Seq(3L, 4L)),
      "item", "rnk", depth = 2, p = 0.9).collect().head
    assert(out.getLong(1) == 0L && out.getDouble(2) == 0.0)
  }

  test("hand-computed partial overlap, top-weighted") {
    // A = [1,2], B = [2,1]: overlap@1 = 0, overlap@2 = 2
    // rbo = (1-p)·(p^0·0/1 + p^1·2/2) = (1-p)·p
    val out = RankCompare.rbo(ranked(Seq(1L, 2L)), ranked(Seq(2L, 1L)),
      "item", "rnk", depth = 2, p = 0.9).collect().head
    assert(approx(out.getDouble(2), (1.0 - 0.9) * 0.9, 1e-9))
    // swapping the head costs more than swapping the tail: A=[1,2,3] vs
    // B=[2,1,3] (head swap) scores below A=[1,2,3] vs B=[1,3,2] (tail swap)
    val headSwap = RankCompare.rbo(ranked(Seq(1L, 2L, 3L)),
      ranked(Seq(2L, 1L, 3L)), "item", "rnk", 3, 0.9).collect().head.getDouble(2)
    val tailSwap = RankCompare.rbo(ranked(Seq(1L, 2L, 3L)),
      ranked(Seq(1L, 3L, 2L)), "item", "rnk", 3, 0.9).collect().head.getDouble(2)
    assert(headSwap < tailSwap)
  }
}
