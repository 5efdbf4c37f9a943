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
}
