package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WaterfillSpec extends SparkTestBase {
  import spark.implicits._

  private def run(demands: Seq[(String, Long)], frac: Double) =
    Waterfill.maxMinFair(demands.toDF("k", "d"), "k", "d", frac)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

  test("hand-computed water level: B=10 over demands 1,2,4,8") {
    // sum=15, B=floor(15*2/3)=10; ascending (1,2,4,8):
    // k=1: 1+3*1=4<=10 ok; k=2: 3+2*2=7<=10 ok; k=3: 7+1*4=11>10 no
    // k*=2, t=(10-3)/2=3.5 -> alloc 1,2,3.5,3.5
    val got = run(Seq(("a", 1L), ("b", 2L), ("c", 4L), ("d", 8L)), 2.0 / 3)
    assert(got("a") == ((1L, 1L, 1.0, false)))
    assert(got("b") == ((2L, 2L, 2.0, false)))
    assert(got("c") == ((4L, 3L, 3.5, true)))
    assert(got("d") == ((8L, 4L, 3.5, true)))
  }

  test("budget covers everything: all keys fully satisfied, none saturated") {
    val got = run(Seq(("a", 3L), ("b", 5L)), 1.0)
    assert(got("a") == ((3L, 1L, 3.0, false)))
    assert(got("b") == ((5L, 2L, 5.0, false)))
  }

  test("budget below the smallest demand: everyone at B/n") {
    // sum=30, frac 0.1 -> B=3; n=3 -> t=1.0, all saturated
    val got = run(Seq(("a", 10L), ("b", 10L), ("c", 10L)), 0.1)
    got.values.foreach { case (_, _, a, s) => assert(a == 1.0 && s) }
  }

  test("zero-demand keys get zero and never saturate") {
    val got = run(Seq(("z", 0L), ("a", 6L), ("b", 6L)), 0.5)
    assert(got("z") == ((0L, 1L, 0.0, false)))
    assert(got("a")._4 && got("b")._4) // 6 each under B=6 -> t=3
    assert(got("a")._3 == 3.0)
  }

  test("seeded differential vs a single-threaded replay, invariants hold") {
    val rnd = new scala.util.Random(7)
    val demands = (0 until 200).map(i => (f"k$i%03d", rnd.nextInt(1000).toLong))
    val frac = 0.37
    val got = run(demands, frac)
    // replay
    val sorted = demands.sortBy { case (k, d) => (d, k) }
    val total = demands.map(_._2).sum
    val b = math.floor(total.toDouble * frac).toLong
    val n = sorted.size
    var p = 0L
    var ks = 0; var pk = 0L
    sorted.zipWithIndex.foreach { case ((_, d), i) =>
      p += d
      if (p + (n - i - 1) * d <= b) { ks = i + 1; pk = p }
    }
    val t = (b - pk).toDouble / (n - ks)
    sorted.zipWithIndex.foreach { case ((k, d), i) =>
      val exp = if (i + 1 <= ks) d.toDouble
        else BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gd, grn, ga, gs) = got(k)
      assert(gd == d && grn == i + 1 && ga == exp && gs == (i + 1 > ks),
        s"key $k: got ${got(k)} expected ($d, ${i + 1}, $exp, ${i + 1 > ks})")
    }
    // the allocation exhausts the budget (up to output rounding)
    val sumAlloc = got.values.map(_._3).sum
    assert(math.abs(sumAlloc - math.min(b, total).toDouble) < 1e-3,
      s"allocated $sumAlloc vs budget $b (total $total)")
  }
}
