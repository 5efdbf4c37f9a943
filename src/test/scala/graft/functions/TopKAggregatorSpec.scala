package graft.functions

import graft.SparkTestBase

class TopKAggregatorSpec extends SparkTestBase {

  private def oracle(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  private def pseudoRandom(n: Int, seed: Int): Seq[Scored] =
    (0 until n).map { i =>
      // deterministic pseudo-random scores with deliberate ties
      Scored(i.toLong, ((i * seed + 7919) % 97) / 10.0)
    }

  test("reduce over any insertion order equals sort-take-k") {
    val agg = new TopKAggregator(5)
    for (seed <- Seq(13, 31, 101); n <- Seq(0, 1, 4, 5, 6, 50)) {
      val xs = pseudoRandom(n, seed)
      // two different insertion orders
      val fwd = xs.foldLeft(agg.zero)(agg.reduce)
      val rev = xs.reverse.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(fwd).items == oracle(xs, 5), s"fwd n=$n seed=$seed")
      assert(agg.finish(rev).items == oracle(xs, 5), s"rev n=$n seed=$seed")
    }
  }

  test("merge over arbitrary partition splits equals the global answer") {
    val agg = new TopKAggregator(4)
    val xs = pseudoRandom(60, 17)
    for (splits <- Seq(Seq(10, 30), Seq(1), Seq(59), Seq(20, 21, 22))) {
      val bounds = (0 +: splits :+ xs.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(agg.finish(merged).items == oracle(xs, 4), s"splits=$splits")
    }
  }

  test("ties broken by ascending id, buffer never exceeds k") {
    val agg = new TopKAggregator(3)
    val xs = Seq(Scored(9, 1.0), Scored(2, 1.0), Scored(5, 1.0), Scored(1, 1.0))
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    assert(b.items.map(_.id) == Seq(1L, 2L, 5L))
    assert(b.items.length == 3)
  }
}
