package graft.ext

import graft.SparkTestBase

class IsotonicSpec extends SparkTestBase {
  import spark.implicits._

  private def fit(rows: Seq[(String, Long, Long, Long)]) =
    Isotonic.isotonicFit(rows.toDF("g", "x", "pos", "n"), "g", "x", "pos", "n")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(4), r.getDouble(5))).toMap

  test("isotonicFit: an already-monotone curve passes through unchanged") {
    val out = fit(Seq(("a", 1L, 1L, 10L), ("a", 2L, 3L, 10L),
      ("a", 3L, 7L, 10L)))
    assert(out(("a", 1L)) == ((0.1, 0.1)))
    assert(out(("a", 2L)) == ((0.3, 0.3)))
    assert(out(("a", 3L)) == ((0.7, 0.7)))
  }

  test("isotonicFit: a single violator pools with its neighbor at the " +
    "weighted average") {
    // rates 0.6, 0.4, 0.8 at n=10 each → pool first two at 10/20 = 0.5
    val out = fit(Seq(("a", 1L, 6L, 10L), ("a", 2L, 4L, 10L),
      ("a", 3L, 8L, 10L)))
    assert(out(("a", 1L))._2 == 0.5 && out(("a", 2L))._2 == 0.5)
    assert(out(("a", 3L))._2 == 0.8)
  }

  test("isotonicFit: cascading pool — a low tail drags earlier blocks " +
    "down until monotone; weighted by n") {
    // rates 0.9 (n=10), 0.5 (n=10), 0.1 (n=20): full pool = 20/40 = 0.5?
    // PAVA: [0.9][0.5]→pool 14/20=0.7; then 0.1(n=20): 0.7 ≥ 0.1 → pool
    // 16/40 = 0.4 — one flat block
    val out = fit(Seq(("a", 1L, 9L, 10L), ("a", 2L, 5L, 10L),
      ("a", 3L, 2L, 20L)))
    assert(Seq(1L, 2L, 3L).forall(x => out(("a", x))._2 == 0.4))
  }

  test("isotonicFit: output is monotone non-decreasing and preserves the " +
    "weighted mean on a zig-zag input; groups fit independently") {
    val zig = Seq(("z", 1L, 1L, 2L), ("z", 2L, 0L, 2L), ("z", 3L, 2L, 2L),
      ("z", 4L, 0L, 2L), ("z", 5L, 2L, 2L),
      ("w", 1L, 0L, 5L), ("w", 2L, 5L, 5L))
    val rows = Isotonic.isotonicFit(zig.toDF("g", "x", "pos", "n"),
        "g", "x", "pos", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(5)))
    val z = rows.filter(_._1 == "z").sortBy(_._2)
    assert(z.map(_._5).zip(z.map(_._5).tail).forall { case (a, b) => a <= b })
    // mean preservation: Σ iso·n = Σ pos (exact at these round numbers)
    assert(math.abs(z.map(r => r._5 * r._4).sum - z.map(_._3).sum) < 1e-9)
    val w = rows.filter(_._1 == "w").sortBy(_._2)
    assert(w.map(_._5).toSeq == Seq(0.0, 1.0), "group w untouched by z")
  }
}
