package graft.ext

import graft.SparkTestBase

class HyperAnfSpec extends SparkTestBase {
  import spark.implicits._

  /** Exact |B(v,t)| by BFS on a small graph — the quadratic truth the
    * sketch approximates.
    */
  private def exactBalls(edges: Seq[(Long, Long)], hops: Int): Map[Int, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    (0 to hops).map { t =>
      t -> nodes.map { v =>
        var ball = Set(v)
        for (_ <- 1 to t)
          ball = ball ++ ball.flatMap(u => adj.getOrElse(u, Set.empty))
        ball.size.toLong
      }.sum
    }.toMap
  }

  test("on a path graph the register recurrence tracks the exact " +
      "neighborhood function within HLL error at every hop") {
    // undirected path 0-1-2-...-19
    val und = (0L until 19L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val df = und.toDF("src", "dst")
    val got = HyperAnf.neighborhoodFunction(df, "src", "dst", hops = 3, b = 6)
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    val exact = exactBalls(und, 3)
    (0 to 3).foreach { t =>
      val rel = math.abs(got(t) - exact(t)) / exact(t)
      assert(rel < 0.25, s"hop $t: est ${got(t)} vs exact ${exact(t)}")
    }
    // and the neighborhood function is strictly growing on a connected graph
    assert(got(0) < got(1) && got(1) < got(2) && got(2) < got(3))
  }

  test("a graph of isolated pairs saturates after one hop: " +
      "N(1) = N(2) = N(3) exactly (registers stop changing)") {
    val pairs = (0L until 40L by 2).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val out = HyperAnf.neighborhoodFunction(pairs.toDF("src", "dst"),
        "src", "dst", hops = 3, b = 6)
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    assert(out(1) == out(2) && out(2) == out(3),
      s"saturated graph must freeze: $out")
    assert(out(0) < out(1))
  }

  test("directed reading: on a one-way path the ball only grows forward") {
    val oneWay = (0L until 10L).map(i => (i, i + 1))
    val df = oneWay.toDF("src", "dst")
    val est = HyperAnf.neighborhoodFunction(df, "src", "dst", hops = 2, b = 6)
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    val exact = exactBalls(oneWay, 2)
    (0 to 2).foreach { t =>
      assert(math.abs(est(t) - exact(t)) / exact(t) < 0.25,
        s"hop $t: ${est(t)} vs ${exact(t)}")
    }
  }
}
