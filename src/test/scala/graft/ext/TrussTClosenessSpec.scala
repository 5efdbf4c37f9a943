package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 batch-9 specs: k-truss peeling and t-closeness EMD. */
class TrussTClosenessSpec extends SparkTestBase {
  import spark.implicits._

  // --------------------------------------------------------------------------
  // Truss.ktruss
  // --------------------------------------------------------------------------

  /** Plain-Scala simultaneous peel replay. */
  private def peelReplay(edges: Set[(Long, Long)], k: Int,
                         rounds: Int): Map[(Long, Long), (String, Int)] = {
    var alive = edges
    var out = Map.empty[(Long, Long), (String, Int)]
    for (r <- 1 to rounds) {
      def supp(e: (Long, Long)): Int = {
        val (a, b) = e
        // count distinct w closing a triangle with (a,b)
        val nodes = alive.flatMap(t => Seq(t._1, t._2))
        nodes.count(w => w != a && w != b &&
          alive.contains((math.min(a, w), math.max(a, w))) &&
          alive.contains((math.min(b, w), math.max(b, w))))
      }
      val removed = alive.filter(e => supp(e) < k - 2)
      out ++= removed.map(_ -> ("removed", r))
      alive = alive.diff(removed)
    }
    out ++ alive.map(_ -> ("kept", 0))
  }

  test("truss: exact match with an independent peel replay on a seeded graph") {
    val rnd = new scala.util.Random(31)
    val edges = (0 until 300).map(_ => (rnd.nextInt(30).toLong,
        rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val got = Truss.ktruss(edges.toSeq.toDF("src", "dst"), "src", "dst",
        k = 4, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getInt(3)))).toMap
    assert(got == peelReplay(edges, 4, 4))
  }

  test("truss: a 5-clique is a 5-truss but not a 6-truss") {
    val clique = (for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b))
    val df = clique.toDF("src", "dst")
    val k5 = Truss.ktruss(df, "src", "dst", k = 5, rounds = 3).collect()
    assert(k5.forall(_.getString(2) == "kept"), "K5 survives k=5")
    val k6 = Truss.ktruss(df, "src", "dst", k = 6, rounds = 3).collect()
    assert(k6.forall(r => r.getString(2) == "removed" && r.getInt(3) == 1),
      "K5 peels entirely in round 1 at k=6")
  }

  test("truss: kept edges each close >= k-2 triangles among kept edges") {
    val rnd = new scala.util.Random(47)
    val edges = (0 until 800).map(_ => (rnd.nextInt(50).toLong,
        rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val rows = Truss.ktruss(edges.toSeq.toDF("src", "dst"), "src", "dst",
      k = 4, rounds = 6).collect()
    val kept = rows.filter(_.getString(2) == "kept")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    kept.foreach { case (a, b) =>
      val nodes = kept.flatMap(t => Seq(t._1, t._2))
      val s = nodes.count(w => w != a && w != b &&
        kept.contains((math.min(a, w), math.max(a, w))) &&
        kept.contains((math.min(b, w), math.max(b, w))))
      assert(s >= 2, s"kept edge ($a,$b) has support $s < 2")
    }
    // partition: every input edge classified exactly once
    assert(rows.length == edges.size)
  }

  test("truss: orientation and duplicates are normalized away") {
    val df = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val rows = Truss.ktruss(df, "src", "dst", k = 3, rounds = 2).collect()
    assert(rows.length == 3) // triangle, deduped
    assert(rows.forall(_.getString(2) == "kept")) // each edge closes 1 tri
  }

  // --------------------------------------------------------------------------
  // Privacy.tCloseness
  // --------------------------------------------------------------------------

  test("t-closeness: hand-computed EMD on a two-class table") {
    // global over v in {a,b,c}: counts 4,2,2 (N=8, m=3)
    // class g1: (a,a,b,c) -> c=(2,1,1), n_c=4
    // class g2: (a,a,b,c) mirrored -> same, so emd(g1)=emd(g2)
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "c"),
      ("g2", "a"), ("g2", "a"), ("g2", "b"), ("g2", "c")
    ).toDF("grp", "v")
    val out = Privacy.tCloseness(df, Seq(col("grp")), col("v"), t = 0.1)
      .orderBy(col("__qi0")).collect()
    // both classes have exactly the global distribution -> emd = 0
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 4L)
      assert(r.getDouble(2) == 0.0)
      assert(!r.getBoolean(3))
    }
  }

  test("t-closeness: mass pushed to one end is flagged") {
    // global: a:4, b:4 (N=8, m=2); class g1 all a, class g2 all b
    // for g1: cum at a = 4*8 - 4*4 = 16; emd = 16 / (4*8*1) = 0.5
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "a"), ("g1", "a"),
      ("g2", "b"), ("g2", "b"), ("g2", "b"), ("g2", "b")
    ).toDF("grp", "v")
    val out = Privacy.tCloseness(df, Seq(col("grp")), col("v"), t = 0.3)
      .orderBy(col("__qi0")).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getDouble(2) == 0.5, s"emd ${r.getDouble(2)}")
      assert(r.getBoolean(3))
    }
  }

  test("t-closeness: EMD replay on a seeded multi-class table") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 2000).map { _ =>
      (s"c${rnd.nextInt(8)}", s"v${rnd.nextInt(5)}")
    }
    val df = rows.toDF("grp", "v")
    val global = rows.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
    val vs = global.keys.toSeq.sorted
    val n = rows.size.toLong
    val m = vs.size
    def emd(grp: String): Double = {
      val cls = rows.filter(_._1 == grp)
      val nc = cls.size.toLong
      val cCounts = cls.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
      var cum = 0L; var s = 0L
      for (v <- vs) {
        cum += cCounts.getOrElse(v, 0L) * n - global(v) * nc
        s += math.abs(cum)
      }
      s.toDouble / (nc * n * (m - 1)).toDouble
    }
    val got = Privacy.tCloseness(df, Seq(col("grp")), col("v"), t = 0.05)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    got.foreach { case (g, e) => assert(e == emd(g), s"class $g") }
  }

  test("t-closeness: numeric severity orders numerically, not lexically") {
    // severities 1..12 — lexicographic order would put 11,12 before 2, so
    // a stringified window order computes a different (wrong) ordered EMD
    // for classes whose mass sits at the numeric ends. Replay both orders.
    val rows = Seq(("g1", 1), ("g1", 2), ("g2", 11), ("g2", 12),
      ("g3", 1), ("g3", 11), ("g4", 2), ("g4", 12))
    val df = rows.toDF("grp", "v")
    val global = rows.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
    val vs = global.keys.toSeq.sorted // NUMERIC sort: 1,2,11,12
    val n = rows.size.toLong
    val m = vs.size
    def emd(grp: String): Double = {
      val cls = rows.filter(_._1 == grp)
      val nc = cls.size.toLong
      val c = cls.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
      var cum = 0L; var s = 0L
      for (v <- vs) {
        cum += c.getOrElse(v, 0L) * n - global(v) * nc
        s += math.abs(cum)
      }
      s.toDouble / (nc * n * (m - 1)).toDouble
    }
    val got = Privacy.tCloseness(df, Seq(col("grp")), col("v"), t = 0.05)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    got.foreach { case (g, e) => assert(e == emd(g), s"class $g: got $e expected ${emd(g)}") }
    // the lexical ('1','11','12','2') replay disagrees for the end-heavy
    // classes — proving the native-type window order is load-bearing
    val vsLex = global.keys.toSeq.map(_.toString).sorted.map(_.toInt)
    def emdLex(grp: String): Double = {
      val cls = rows.filter(_._1 == grp)
      val nc = cls.size.toLong
      val c = cls.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
      var cum = 0L; var s = 0L
      for (v <- vsLex) {
        cum += c.getOrElse(v, 0L) * n - global(v) * nc
        s += math.abs(cum)
      }
      s.toDouble / (nc * n * (m - 1)).toDouble
    }
    assert(got.exists { case (g, e) => e != emdLex(g) },
      "fixture should distinguish numeric from lexical EMD order")
  }
}
