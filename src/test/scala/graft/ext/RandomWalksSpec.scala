package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RandomWalksSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent replay of the md5 pick: neighbors(v)[md5(w:t:v) mod deg]. */
  private def pick(walker: Long, t: Int, cur: Long, deg: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$walker:$t:$cur".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % deg).toInt
  }

  private def sym(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map { case (a, b) => (b, a) }).distinct.toDF("src", "dst")

  test("every step matches a single-threaded replay of the hash walk") {
    val edges = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    val adjacency = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).distinct.sorted }
    val starts = Seq(1L, 4L).toDF("start")
    val got = RandomWalks.walks(edges, "src", "dst", starts, "start", steps = 5)
      .orderBy("walker", "step")
      .as[(Long, Int, Long)].collect()
    for (w <- Seq(1L, 4L)) {
      var cur = w
      val expected = Seq.newBuilder[Long]
      expected += cur
      for (t <- 1 to 5) {
        val ns = adjacency(cur)
        cur = ns(pick(w, t, cur, ns.length))
        expected += cur
      }
      val walk = got.filter(_._1 == w).sortBy(_._2).map(_._3).toSeq
      assert(walk == expected.result(), s"walker $w")
    }
  }

  test("every consecutive pair of a walk is an edge of the input graph") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (1L, 3L), (2L, 5L)))
    val edgeSet = edges.as[(Long, Long)].collect().toSet
    val starts = (1L to 5L).toDF("start")
    val walks = RandomWalks.walks(edges, "src", "dst", starts, "start", 6)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3).toSeq)
    walks.foreach { w =>
      assert(w.length == 7)
      w.sliding(2).foreach { case Seq(a, b) =>
        assert(edgeSet.contains((a, b)), s"($a,$b) not an edge in $w")
      }
    }
  }

  test("a start node with no out-edges keeps its step-0 prefix only") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val starts = Seq(1L, 99L).toDF("start")
    val got = RandomWalks.walks(edges, "src", "dst", starts, "start", 3)
      .as[(Long, Int, Long)].collect()
    val stranded = got.filter(_._1 == 99L)
    assert(stranded.toSeq == Seq((99L, 0, 99L)))
    assert(got.count(_._1 == 1L) == 4) // full 3-step walk survives
  }
}
