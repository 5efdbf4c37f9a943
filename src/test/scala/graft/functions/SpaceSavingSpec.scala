package graft.functions

import graft.SparkTestBase

class SpaceSavingSpec extends SparkTestBase {
  import spark.implicits._

  private def run(items: Seq[String], capacity: Int, parts: Int = 8) = {
    val ds = items.toDS().repartition(parts)
    ds.select(new SpaceSavingAggregator(capacity).toColumn).head()
  }

  test("exact when every distinct item fits: counts exact, zero error") {
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val out = run(scala.util.Random.shuffle(items), capacity = 8)
    assert(out.map(c => c.item -> (c.est, c.err)).toMap ==
      Map("a" -> ((30L, 0L)), "b" -> ((20L, 0L)), "c" -> ((10L, 0L))))
  }

  test("skewed stream: heavy hitters tracked, bounds hold") {
    val rng = new scala.util.Random(9)
    // zipf-ish: item i appears ~ 4000/i times
    val items = (1 to 60).flatMap(i => Seq.fill(4000 / i)(s"t$i"))
    val shuffled = rng.shuffle(items)
    val n = shuffled.size
    val capacity = 20
    val out = run(shuffled, capacity)
    assert(out.size <= capacity)
    val truth = shuffled.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tracked = out.map(_.item).toSet
    // anything with true count > 2N/capacity must be present (margin over the
    // 1/capacity theoretical threshold to absorb merge slack)
    truth.filter(_._2 > 2L * n / capacity).keys.foreach { hh =>
      assert(tracked.contains(hh), s"heavy hitter $hh missing from $tracked")
    }
    // per-item bounds: est is an upper bound, est - err a lower bound
    out.foreach { c =>
      val t = truth(c.item)
      assert(c.est >= t, s"${c.item}: est ${c.est} < true $t")
      assert(c.est - c.err <= t, s"${c.item}: lower ${c.est - c.err} > true $t")
    }
  }

  test("guarantees are partition-layout independent") {
    val items = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"x$i"))
    Seq(1, 4, 16).foreach { parts =>
      val out = run(items, capacity = 12, parts = parts)
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      out.foreach { c =>
        val t = truth(c.item)
        assert(c.est >= t && c.est - c.err <= t,
          s"parts=$parts ${c.item}: est=${c.est} err=${c.err} true=$t")
      }
    }
  }
}
