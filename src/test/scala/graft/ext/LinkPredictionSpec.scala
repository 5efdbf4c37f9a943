package graft.ext

import graft.SparkTestBase

class LinkPredictionSpec extends SparkTestBase {
  import spark.implicits._

  private def scores(edges: Seq[(Long, Long)]) =
    LinkPrediction.neighborScores(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("path graph: endpoints of each wedge score through the middle degree") {
    // 1-2-3-4: candidates (1,3) via 2 (deg 2) and (2,4) via 3 (deg 2)
    val out = scores(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(out.keySet == Set((1L, 3L), (2L, 4L)))
    val (n, aa, ra) = out((1L, 3L))
    assert(n == 1)
    assert(approx(aa, math.round(1.0 / math.log(2) * 1e6) / 1e6, 1e-9))
    assert(approx(ra, 0.5, 1e-9))
  }

  test("square: two common neighbors accumulate; diagonals are the candidates") {
    val out = scores(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(out.keySet == Set((1L, 3L), (2L, 4L)))
    val (n, aa, ra) = out((1L, 3L))
    assert(n == 2)
    assert(approx(aa, math.round(2.0 / math.log(2) * 1e6) / 1e6, 1e-9))
    assert(approx(ra, 1.0, 1e-9))
  }

  test("existing edges are excluded even when they share neighbors") {
    // triangle + pendant: (1,2),(2,3),(1,3) all adjacent → only (1,4)? no:
    // 4 hangs off 3; wedge 1-3-4 and 2-3-4 give candidates (1,4),(2,4)
    val out = scores(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(out.keySet == Set((1L, 4L), (2L, 4L)))
    // middle is 3 with deg 3
    assert(approx(out((1L, 4L))._2,
      math.round(1.0 / math.log(3) * 1e6) / 1e6, 1e-9))
  }

  test("matches a brute-force reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      .filter(t => t._1 != t._2)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).distinct
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = (for {
      a <- adj.keys; b <- adj.keys
      if a < b && !adj(a).contains(b)
      common = adj(a) intersect adj(b)
      if common.nonEmpty
    } yield (a, b) -> (common.size.toLong,
      math.round(common.toSeq.map(v => 1.0 / math.log(adj(v).size)).sum * 1e6) / 1e6,
      math.round(common.toSeq.map(v => 1.0 / adj(v).size).sum * 1e6) / 1e6)).toMap
    val got = scores(edges)
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, (n, aa, ra)) =>
      val (en, eaa, era) = expect(k)
      assert(n == en, s"$k n_common")
      assert(approx(aa, eaa, 1e-6), s"$k aa: $aa vs $eaa")
      assert(approx(ra, era, 1e-6), s"$k ra: $ra vs $era")
    }
  }
}
