package graft.metrics

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LongTailSpec extends SparkTestBase {
  import spark.implicits._

  private def interactions = (
    Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("z") ++ Seq("w")
  ).toDF("item")

  test("volumes, cumulative sums and head split") {
    val out = LongTail.longTailDF(interactions, "item", headPct = 0.5)
      .orderBy("rank").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("x", "y", "z", "w"))
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 3L, 3L, 1L)) // tie y<z by item
    assert(out.map(_.getLong(3)).toSeq == Seq(5L, 8L, 11L, 12L))
    assert(approx(out.last.getDouble(4), 1.0))
    assert(out.map(_.getBoolean(5)).toSeq == Seq(true, false, false, false))
  }

  test("distributed prefix-sum agrees with window formulation (differential)") {
    val big = (1 to 500).flatMap(i => Seq.fill(i % 17 + 1)(s"item_$i")).toDF("item")
    val a = LongTail.longTailDF(big, "item").orderBy("rank")
      .select("item", "volume", "rank", "cum_volume").collect().toSeq
    val b = LongTail.longTailWindowDF(big, "item").orderBy("rank")
      .select("item", "volume", "rank", "cum_volume").collect().toSeq
    assert(a == b)
  }

  test("pct_of_total is monotone and ends at 1.0") {
    val out = LongTail.longTailDF(interactions, "item").orderBy("rank")
      .select("pct_of_total").collect().map(_.getDouble(0))
    assert(out.zip(out.tail).forall { case (p, n) => p <= n + 1e-15 })
    assert(approx(out.last, 1.0))
  }

  test("hillTailIndex matches the hand-computed estimator on known volumes") {
    import spark.implicits._
    // volumes 8, 4, 2, 1 → with k=2: x_(1)=8, x_(2)=4, x_(3)=2;
    // Σ ln(x_i/x_3) = ln4 + ln2 = 2.07944154, α̂ = 2/2.07944154 = 0.961797
    val df = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).toDF("item")
    val out = LongTail.hillTailIndex(df, "item", k = 2).collect().head
    assert(out.getInt(0) == 2)
    assert(out.getLong(1) == 2L)
    assert(approx(out.getDouble(2), 2.079442, 1e-6))
    assert(approx(out.getDouble(3), 0.961797, 1e-6))
  }

  test("hillTailIndex: a steeper (thinner-tailed) catalog yields a larger " +
    "alpha than a blockbuster-dominated one") {
    import spark.implicits._
    // flat-ish: 10,9,8,7 vs extreme: 1000,10,2,1 at k=2
    val flat = (Seq.fill(10)("a") ++ Seq.fill(9)("b") ++ Seq.fill(8)("c") ++
      Seq.fill(7)("d")).toDF("item")
    val steep = (Seq.fill(1000)("a") ++ Seq.fill(10)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).toDF("item")
    val aFlat = LongTail.hillTailIndex(flat, "item", k = 2)
      .collect().head.getDouble(3)
    val aSteep = LongTail.hillTailIndex(steep, "item", k = 2)
      .collect().head.getDouble(3)
    assert(aFlat > aSteep, s"flat $aFlat should exceed steep $aSteep")
  }
}
