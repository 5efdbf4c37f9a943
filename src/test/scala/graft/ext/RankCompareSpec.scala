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

  test("kendallTau: perfect agreement is 1, perfect reversal is -1") {
    import spark.implicits._
    val agree = Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L),
      ("d", 4L, 40L)).toDF("k", "x", "y")
    assert(RankCompare.kendallTau(agree, "k", "x", "y")
      .collect().head.getDouble(5) == 1.0)
    val reverse = Seq(("a", 1L, 40L), ("b", 2L, 30L), ("c", 3L, 20L),
      ("d", 4L, 10L)).toDF("k", "x", "y")
    assert(RankCompare.kendallTau(reverse, "k", "x", "y")
      .collect().head.getDouble(5) == -1.0)
  }

  test("kendallTau: hand-computed mixed case with a tie in y") {
    import spark.implicits._
    // x: 1,2,3,4; y: 10,30,20,30 → pairs (6): ab C, ac C, ad C, bc D,
    // bd tied-y, cd C → C=4, D=1, n1=0, n2=1, n0=6
    // tau_b = 3 / sqrt(6·5) = 0.547723
    val df = Seq(("a", 1L, 10L), ("b", 2L, 30L), ("c", 3L, 20L),
      ("d", 4L, 30L)).toDF("k", "x", "y")
    val out = RankCompare.kendallTau(df, "k", "x", "y").collect().head
    assert(out.getLong(0) == 4 && out.getLong(1) == 4 && out.getLong(2) == 1)
    assert(out.getLong(3) == 0 && out.getLong(4) == 1)
    assert(approx(out.getDouble(5), 0.547723, 1e-6))
  }
}
