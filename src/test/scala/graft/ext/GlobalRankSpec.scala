package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GlobalRankSpec extends SparkTestBase {
  import spark.implicits._

  test("globalRowNumber matches the single-window ROW_NUMBER") {
    val df = (0 until 1000)
      .map(i => ((i * 7919) % 101, i.toLong))
      .toDF("v", "id")
      .repartition(8)
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .orderBy("rn").as[(Int, Long, Long)].collect()
    val got = GlobalRank.globalRowNumber(df, Seq(col("v"), col("id")))
      .orderBy("rn").as[(Int, Long, Long)].collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("globalRowNumber plan has no single-partition global window") {
    val df = (0 until 100).map(i => (i % 7, i.toLong)).toDF("v", "id")
    val plan = GlobalRank.globalRowNumber(df, Seq(col("v"), col("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no Window operator expected:\n${plan.take(800)}")
  }

  test("equiDepthHistogram: equal-count buckets covering all rows, ordered edges") {
    val df = (0 until 800).map(i => ((i * 31) % 997, i.toLong)).toDF("v", "id")
    val out = GlobalRank.equiDepthHistogram(df, "v", Seq("id"), buckets = 8)
      .orderBy("bucket").collect()
    assert(out.length == 8)
    assert(out.map(_.getLong(1)).sum == 800L)
    // equal depth: every bucket holds exactly N/B rows here (800 divisible by 8)
    assert(out.forall(_.getLong(1) == 100L))
    // bucket ranges are disjoint and ascending
    val edges = out.map(r => (r.getInt(2), r.getInt(3)))
    edges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }

  test("equiDepthHistogram handles N not divisible by buckets") {
    val df = (0 until 10).map(i => (i, i.toLong)).toDF("v", "id")
    val out = GlobalRank.equiDepthHistogram(df, "v", Seq("id"), buckets = 3)
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(1)).sum == 10L)
    // closed form (rn-1)*B div N: bucket sizes 4, 3, 3
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 3L, 3L))
  }

  test("exactQuantiles picks the value at ceil(p*N) under the total order") {
    val df = (1 to 100).map(i => (i * 10, i.toLong)).toDF("v", "id")
    val out = GlobalRank.exactQuantiles(df, "v", Seq("id"), Seq(0.5, 0.9, 0.99, 1.0))
      .orderBy("p").collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(out == Map(0.5 -> 500, 0.9 -> 900, 0.99 -> 990, 1.0 -> 1000))
  }

  test("exactQuantiles: tiny p clamps to rank 1") {
    val df = (1 to 10).map(i => (i, i.toLong)).toDF("v", "id")
    val out = GlobalRank.exactQuantiles(df, "v", Seq("id"), Seq(0.001))
      .collect().head
    assert(out.getInt(1) == 1)
  }

  test("corrMatrix matches per-pair corr in one pass") {
    val df = (0 until 500)
      .map { i => (i.toDouble, 2.0 * i + 3, (i % 17).toDouble) }
      .toDF("a", "b", "c")
    val out = Profiling.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("a", "b")) - 1.0) < 1e-9) // exact linear relation
    val cAc = df.stat.corr("a", "c")
    assert(math.abs(out(("a", "c")) - cAc) < 1e-9)
  }
}
