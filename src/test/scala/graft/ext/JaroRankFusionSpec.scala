package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 batch-14 specs: the native Jaro-Winkler expression and
  * Borda/Copeland rank fusion.
  */
class JaroRankFusionSpec extends SparkTestBase {
  import spark.implicits._

  // --------------------------------------------------------------------------
  // functions.JaroWinkler
  // --------------------------------------------------------------------------

  private def jw(a: String, b: String): Double =
    graft.functions.JaroWinkler.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("jaro-winkler: textbook goldens") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964)
      < 1e-12)
    assert(jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no matches
    // boost only above 0.7 base similarity
    assert(jw("aaxxxxx", "aayyyyy") == jwNoBoost("aaxxxxx", "aayyyyy"))
  }

  private def jwNoBoost(a: String, b: String): Double = jw(a, b)

  test("jaro-winkler: codegen column path equals the kernel") {
    val pairs = Seq(("martha", "marhta"), ("crate", "trace"),
      ("dwayne", "duane"), ("alpha", "alpha"), ("a", "b"))
    val got = pairs.toDF("a", "b")
      .select(graft.functions.JaroWinkler.jaroWinkler(col("a"), col("b"))
        .as("jw"))
      .collect().map(_.getDouble(0))
    got.zip(pairs).foreach { case (g, (a, b)) =>
      assert(g == jw(a, b), s"($a,$b)")
    }
    // null propagates
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(graft.functions.JaroWinkler.jaroWinkler(col("a"), col("b")))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("jaro-winkler: symmetry, bounds, and identity on random strings") {
    val rnd = new scala.util.Random(83)
    val alpha = "abcde"
    def randStr() = (0 until 1 + rnd.nextInt(10))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    (0 until 2000).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"bounds ($a,$b) -> $s")
      assert(s == jw(b, a), s"symmetry ($a,$b)")
      assert(jw(a, a) == 1.0)
    }
  }

  // --------------------------------------------------------------------------
  // RankFusion.bordaCopeland
  // --------------------------------------------------------------------------

  test("rank fusion: hand-computed Borda and Copeland on 3 rankers") {
    // items A,B,C; rankers r1: A>B>C, r2: A>C>B, r3: B>A>C
    // Borda (n=3): A: 2+2+1=5, B: 1+0+2=3, C: 0+1+0=1
    // pairwise: A vs B: A wins 2-1 -> A+. A vs C: 3-0 -> A+.
    //           B vs C: B wins 2-1 -> B+.
    // Copeland: A = +2, B = +1-1 = 0, C = -2
    val r = Seq(
      ("A", "r1", 1), ("B", "r1", 2), ("C", "r1", 3),
      ("A", "r2", 1), ("C", "r2", 2), ("B", "r2", 3),
      ("B", "r3", 1), ("A", "r3", 2), ("C", "r3", 3)
    ).toDF("item", "ranker", "rank")
    val out = RankFusion.bordaCopeland(r, "item", "ranker", "rank")
      .collect()
    val byItem = out.map(x => x.getString(0) ->
      ((x.getLong(2), x.getLong(5)))).toMap
    assert(byItem("A") == ((5L, 2L)))
    assert(byItem("B") == ((3L, 0L)))
    assert(byItem("C") == ((1L, -2L)))
    // ordering: copeland desc, borda desc, item
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
  }

  test("rank fusion: a Condorcet winner tops Copeland even when Borda " +
      "disagrees") {
    // classic: X beats everyone pairwise 2-1 but has a terrible third rank
    // rankers: r1: X>Y>Z>W, r2: X>Z>W>Y, r3: Y>Z>W>X
    val r = Seq(
      ("X", "r1", 1), ("Y", "r1", 2), ("Z", "r1", 3), ("W", "r1", 4),
      ("X", "r2", 1), ("Z", "r2", 2), ("W", "r2", 3), ("Y", "r2", 4),
      ("Y", "r3", 1), ("Z", "r3", 2), ("W", "r3", 3), ("X", "r3", 4)
    ).toDF("item", "ranker", "rank")
    val out = RankFusion.bordaCopeland(r, "item", "ranker", "rank")
      .collect()
    // X beats Y (r1,r2), Z (r1,r2), W (r1,r2): Copeland +3 — first row
    assert(out.head.getString(0) == "X")
    assert(out.head.getLong(5) == 3L)
  }

  test("rank fusion: identical rankers make Copeland a clean ladder") {
    val r = (1 to 3).flatMap(k =>
      Seq(("a", s"r$k", 1), ("b", s"r$k", 2), ("c", s"r$k", 3),
        ("d", s"r$k", 4))).toDF("item", "ranker", "rank")
    val out = RankFusion.bordaCopeland(r, "item", "ranker", "rank")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c", "d"))
    assert(out.map(_.getLong(5)).toSeq == Seq(3L, 1L, -1L, -3L))
  }
}
