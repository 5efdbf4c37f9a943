package graft.ext

import graft.SparkTestBase

class MaxCoverageSpec extends SparkTestBase {
  import spark.implicits._

  private def run(items: Seq[(Long, String)], k: Int) =
    MaxCoverage.greedySelect(items.toDF("id", "f"), "id", "f", k)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("hand-worked greedy: biggest set first, then best marginal") {
    // A={a,b,c}, B={c,d}, C={d,e,f,g}, D={a,g}
    val items = Seq(
      1L -> "a", 1L -> "b", 1L -> "c",
      2L -> "c", 2L -> "d",
      3L -> "d", 3L -> "e", 3L -> "f", 3L -> "g",
      4L -> "a", 4L -> "g")
    // round1: C gains 4. round2: A gains 3 (a,b,c). round3: B gains 0? no —
    // covered={d,e,f,g,a,b,c}; B adds nothing, D adds nothing -> stop at 2
    assert(run(items, 4) == Seq((1, 3L, 4L, 4L), (2, 1L, 3L, 7L)))
  }

  test("ties break to the smallest id") {
    val items = Seq(1L -> "x", 2L -> "y") // both gain 1
    assert(run(items, 1) == Seq((1, 1L, 1L, 1L)))
  }

  test("duplicate (id, feature) rows don't inflate gains") {
    val items = Seq(1L -> "x", 1L -> "x", 1L -> "y", 2L -> "z")
    assert(run(items, 2) == Seq((1, 1L, 2L, 2L), (2, 2L, 1L, 3L)))
  }

  test("seeded differential vs a single-threaded greedy replay") {
    val rnd = new scala.util.Random(11)
    val items = (0 until 50).flatMap { id =>
      (0 until 3 + rnd.nextInt(20)).map(_ => (id.toLong, s"f${rnd.nextInt(120)}"))
    }
    val got = run(items, 8)
    // replay
    val sets = items.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(_._2).toSet }
    var covered = Set.empty[String]
    val exp = Seq.newBuilder[(Int, Long, Long, Long)]
    var r = 1
    var done = false
    while (r <= 8 && !done) {
      val (id, g) = sets.toSeq
        .map { case (i, s) => (i, (s -- covered).size.toLong) }
        .sortBy { case (i, g2) => (-g2, i) }.head
      if (g == 0) done = true
      else {
        covered ++= sets(id)
        exp += ((r, id, g, covered.size.toLong))
        r += 1
      }
    }
    assert(got == exp.result(), s"got $got")
  }
}
