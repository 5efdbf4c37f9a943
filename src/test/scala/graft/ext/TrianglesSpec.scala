package graft.ext

import graft.SparkTestBase

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    Triangles.triangleCensus(edges.toDF("src", "dst"), "src", "dst")
      .collect().head

  test("K4 has 4 triangles and clustering 1") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val r = census(k4)
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_wedges") == 12)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(approx(r.getAs[Double]("global_clustering"), 1.0))
  }

  test("triangle with a pendant edge") {
    // 1-2-3 triangle, 4 hangs off 1: wedges = 3 + C(3,2)·... deg(1)=3 others
    val r = census(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
    assert(r.getAs[Long]("n_triangles") == 1)
    // degrees: 1→3, 2→2, 3→2, 4→1 ⇒ wedges = 3 + 1 + 1 + 0 = 5
    assert(r.getAs[Long]("n_wedges") == 5)
    assert(approx(r.getAs[Double]("global_clustering"), 0.6))
  }

  test("input duplicates, self-loops and reversed orientation are normalized") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (1L, 3L))
    val r = census(messy)
    assert(r.getAs[Long]("n_edges") == 3)
    assert(r.getAs[Long]("n_triangles") == 1)
  }

  test("hub star graph has zero triangles and many wedges") {
    val star = (2L to 20L).map(i => (1L, i))
    val r = census(star)
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("n_wedges") == 19L * 18 / 2)
  }

  test("matches brute-force a<b<c count on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val norm = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val es = norm.toSet
    val nodes = norm.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    var brute = 0L
    for {
      i <- nodes; j <- nodes if i < j; k <- nodes if j < k
      if es((i, j)) && es((j, k)) && es((i, k))
    } brute += 1
    val r = census(edges)
    assert(r.getAs[Long]("n_triangles") == brute)
  }

  test("assortativity: a star is perfectly disassortative (-1), a " +
    "4-path is -0.5, a regular graph is degenerate (null)") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("s", "t")
    val starOut = Triangles.assortativity(star, "s", "t").collect().head
    assert(starOut.getLong(0) == 5 && starOut.getLong(1) == 4)
    assert(starOut.getDouble(2) == -1.0)
    // path 1-2-3-4: degrees 1,2,2,1 → hand Pearson over the 6 symmetrized
    // endpoint pairs: r = -4/8 = -0.5
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    assert(Triangles.assortativity(path, "s", "t")
      .collect().head.getDouble(2) == -0.5)
    // 4-cycle: every degree 2 → zero variance → null, not a crash
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "t")
    assert(Triangles.assortativity(cycle, "s", "t").collect().head.isNullAt(2))
  }

  test("localClusteringByDegree: triangle with a pendant edge, by hand") {
    // triangle {1,2,3} + edge 3-4: C(1)=C(2)=1, C(3)=1/3, node 4 deg<2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "t")
    val out = Triangles.localClusteringByDegree(g, "s", "t")
      .orderBy("deg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 2, s"deg-1 node must be excluded: ${out.toSeq}")
    assert(out(0)._1 == 2L && out(0)._2 == 2L && out(0)._3 == 1.0)
    assert(out(1)._1 == 3L && out(1)._2 == 1L &&
      math.abs(out(1)._3 - 1.0 / 3.0) < 1e-9)
  }

  test("localClusteringByDegree: K4 is fully clustered at every node; " +
      "a star has zero closure") {
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("s", "t")
    val outK4 = Triangles.localClusteringByDegree(k4, "s", "t").collect()
    assert(outK4.length == 1)
    assert(outK4.head.getLong(0) == 3L && outK4.head.getLong(1) == 4L &&
      outK4.head.getDouble(2) == 1.0)
    val star = (2L to 6L).map(i => (1L, i)).toDF("s", "t")
    val outStar = Triangles.localClusteringByDegree(star, "s", "t").collect()
    // only the hub has deg >= 2, and it closes nothing
    assert(outStar.length == 1 && outStar.head.getLong(0) == 5L &&
      outStar.head.getDouble(2) == 0.0)
  }
}
