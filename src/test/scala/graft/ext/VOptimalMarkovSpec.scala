package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 batch-12 specs: V-optimal histogram DP and Markov
  * removal-effect attribution.
  */
class VOptimalMarkovSpec extends SparkTestBase {
  import spark.implicits._

  // --------------------------------------------------------------------------
  // VOptimal.histogram
  // --------------------------------------------------------------------------

  /** Brute-force optimal SSE over every boundary placement. */
  private def bruteSse(cells: Seq[(Long, Long, Long)], b: Int): Double = {
    // cells: (cnt, s1, s2) in order
    def sse(lo: Int, hi: Int): Double = {
      val n = cells.slice(lo, hi + 1).map(_._1).sum
      val s1 = cells.slice(lo, hi + 1).map(_._2).sum
      val s2 = cells.slice(lo, hi + 1).map(_._3).sum
      (BigDecimal(s2) * n - BigDecimal(s1) * s1).toDouble / n.toDouble
    }
    val m = cells.length
    // enumerate all (b-1)-subsets of split points 0..m-2
    def go(start: Int, rem: Int, lo: Int): Double =
      if (rem == 0) sse(lo, m - 1)
      else (start to m - 1 - rem).map { cut =>
        sse(lo, cut) + go(cut + 1, rem - 1, cut + 1)
      }.min
    go(0, b - 1, 0)
  }

  test("v-optimal: total SSE equals the brute-force optimum on a small set") {
    // values 1..40 with a planted bimodal shape
    val vals = (1L to 20L) ++ (101L to 120L)
    val out = VOptimal.histogram(vals.toDF("v"), "v", cells = 10,
      buckets = 3).collect()
    assert(out.length == 3)
    val total = out.map(_.getDouble(4)).sum
    // replicate the pre-bucketing to get the DP's cell moments
    val minv = vals.min; val maxv = vals.max
    val cellOf = (v: Long) => (v - minv) * 10 / (maxv - minv + 1)
    val cells = vals.groupBy(cellOf).toSeq.sortBy(_._1).map { case (_, vs) =>
      (vs.size.toLong, vs.sum, vs.map(x => x * x).sum)
    }
    val best = bruteSse(cells, 3)
    assert(math.abs(total - best) < 1e-6,
      s"dp total $total vs brute $best")
    // buckets partition the cell range: contiguous, ordered, exhaustive
    val sorted = out.sortBy(_.getInt(0))
    assert(sorted.head.getLong(1) == 0L || sorted.head.getLong(1) >= 0L)
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) > a.getLong(2),
        "next bucket starts after the previous ends")
    }
    assert(sorted.map(_.getLong(3)).sum == vals.size.toLong, "rows covered")
  }

  test("v-optimal: a two-cluster column splits exactly at the gap") {
    val vals = Seq.fill(50)(10L) ++ Seq.fill(50)(1000L)
    val out = VOptimal.histogram(vals.toDF("v"), "v", cells = 8,
      buckets = 2).collect().sortBy(_.getInt(0))
    // each cluster is constant -> per-bucket SSE 0
    assert(out.forall(_.getDouble(4) == 0.0), out.mkString(";"))
    assert(out.map(_.getLong(3)).toSeq == Seq(50L, 50L))
  }

  test("v-optimal: parameter guards") {
    val df = (1L to 10L).toDF("v")
    intercept[IllegalArgumentException] {
      VOptimal.histogram(df, "v", cells = 1, buckets = 2)
    }
    intercept[IllegalArgumentException] {
      VOptimal.histogram(df, "v", cells = 16, buckets = 1)
    }
  }

  // --------------------------------------------------------------------------
  // AbsorbingMarkov.removalEffects
  // --------------------------------------------------------------------------

  test("markov attribution: hand-computed removal effects on a tiny chain") {
    // user journeys: A: s->c->p, B: s->p, C: s->c (no conversion)
    // states: s(start), c(click), p(purchase, absorbing)
    // transitions: s->c x2, s->p x1, c->p x1 (C's click is terminal)
    // P(c->p)=1/1=1, P(s->c)=2/3, P(s->p)=1/3
    // base (4 iters, converged): p(c)=1, p(s)=1/3 + 2/3*1 = 1
    // starts: all at s -> conv_base = 1
    // remove c: p(c)=0 -> p(s)=1/3; RE = 1 - (1/3)/1 = 2/3
    val events = Seq(
      ("A", 1, "s"), ("A", 2, "c"), ("A", 3, "p"),
      ("B", 1, "s"), ("B", 2, "p"),
      ("C", 1, "s"), ("C", 2, "c")
    ).toDF("user", "t", "state")
    val out = AbsorbingMarkov.removalEffects(events, "user", Seq("t"),
        "state", absorbing = "p", removable = Seq("c"), iterations = 4)
      .collect().head
    assert(out.getString(0) == "c")
    assert(math.abs(out.getDouble(1) - 1.0) < 1e-12, "conv_base")
    assert(math.abs(out.getDouble(2) - 1.0 / 3) < 1e-12, "conv_removed")
    assert(math.abs(out.getDouble(3) - 2.0 / 3) < 1e-12, "removal effect")
    assert(math.abs(out.getDouble(4) - 1.0) < 1e-9,
      "single channel takes all credit")
  }

  test("markov attribution: effects are non-negative and credits sum to 1") {
    val rnd = new scala.util.Random(61)
    val states = Array("a", "b", "c", "p")
    val events = (0 until 300).flatMap { u =>
      (0 until 1 + rnd.nextInt(5)).map(t => (s"u$u", t, states(rnd.nextInt(4))))
    }.toDF("user", "t", "state")
    val rows = AbsorbingMarkov.removalEffects(events, "user", Seq("t"),
      "state", absorbing = "p", removable = Seq("a", "b", "c"),
      iterations = 4).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1e-12, s"negative effect: $r")
      assert(r.getDouble(2) <= r.getDouble(1) + 1e-12, "monotone")
    }
    val creditSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(creditSum - 1.0) < 1e-9, s"credits sum $creditSum")
  }

  test("markov attribution: the absorbing state cannot be removable") {
    val events = Seq(("u", 1, "s"), ("u", 2, "p")).toDF("user", "t", "state")
    intercept[IllegalArgumentException] {
      AbsorbingMarkov.removalEffects(events, "user", Seq("t"), "state",
        "p", Seq("p"), 2)
    }
  }
}
