package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed closed forms + structural invariants for the round-10
  * batch-3 modules: consistent/rendezvous sharding, Apriori triples,
  * absorbing-Markov value iteration, entropy l-diversity.
  */
class NexusModulesSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference 32-bit md5-prefix hash — the same convention the modules
    * and the DuckDB oracles state. */
  private def refH32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  test("Sharding.ring: one point per (node, vnode) at the reference hash") {
    val r = Sharding.ring(spark, 3, 4).collect()
    assert(r.length == 12)
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet ==
      (for (n <- 0 to 2; v <- 0 to 3) yield (n.toLong, v.toLong)).toSet)
    r.foreach(x =>
      assert(x.getLong(2) == refH32(s"n:${x.getLong(0)}:${x.getLong(1)}")))
  }

  test("consistentOwners matches a driver-side successor search, and " +
      "growing the ring moves keys ONLY to the new node") {
    val keys = (1L to 200L).toDF("k")
    val ring4 = Sharding.ring(spark, 4, 8)
    val ring5 = Sharding.ring(spark, 5, 8)
    val before = Sharding.consistentOwners(keys, "k", ring4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: successor on the collected ring
    val pts = ring4.collect().map(r => (r.getLong(2), r.getLong(0)))
      .sortBy(identity)
    (1L to 200L).foreach { k =>
      val kh = refH32(s"k:$k")
      val expect = pts.find(_._1 >= kh).getOrElse(pts.head)._2
      assert(before(k) == expect, s"key $k")
    }
    val after = Sharding.consistentOwners(keys, "k", ring5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 200L).foreach { k =>
      assert(after(k) == before(k) || after(k) == 4L,
        s"key $k moved to an OLD node: ${before(k)} -> ${after(k)}")
    }
    assert(after.values.exists(_ == 4L), "the new node got some keys")
  }

  test("rendezvousOwners: argmax matches the reference, and removing a " +
      "node re-homes exactly that node's keys") {
    val keys = (1L to 200L).toDF("k")
    val n4 = spark.range(4).select(col("id").as("node"))
    val before = Sharding.rendezvousOwners(keys, "k", n4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 200L).foreach { k =>
      val expect = (0L to 3L).maxBy(n => (refH32(s"r:$n:$k"), n))
      assert(before(k) == expect, s"key $k")
    }
    val after = Sharding
      .rendezvousOwners(keys, "k", n4.filter(col("node") > 0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 200L).foreach { k =>
      if (before(k) != 0L) assert(after(k) == before(k),
        s"surviving key $k moved: ${before(k)} -> ${after(k)}")
      else assert(after(k) != 0L)
    }
  }

  test("frequentTriples: exact support and lift on a hand basket set") {
    val b = Seq((1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (2, "c"),
      (3, "a"), (3, "b"), (4, "c")).toDF("bk", "it")
    // nb = 4, threshold n*2 >= 4 -> n >= 2; abc appears in baskets 1, 2
    val out = Itemsets.frequentTriples(b, "bk", "it", 1L, 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("a", "b", "c"))
    assert(r.getLong(3) == 2L)
    assert(approx(r.getDouble(4), 2.0 * 16 / 27)) // n*N^2 / (3*3*3)
  }

  test("frequentTriples: a triple below support is cut even when all its " +
      "pairs pass") {
    // ab, ac, bc each in 2 baskets but abc never co-occurs
    val b = Seq((1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "b"), (3, "c"),
      (4, "a"), (4, "b"), (5, "a"), (5, "c"), (6, "b"), (6, "c"))
      .toDF("bk", "it")
    assert(Itemsets.frequentTriples(b, "bk", "it", 1L, 3L).isEmpty)
  }

  test("absorptionProbability: two value-iteration rounds match the hand " +
      "fold") {
    // A->P, A->B, B->P, B->B each once: P(.|A) = P(.|B) = 1/2 each
    val ev = Seq((1, 1, "A"), (1, 2, "P"), (2, 1, "A"), (2, 2, "B"),
      (3, 1, "B"), (3, 2, "P"), (4, 1, "B"), (4, 2, "B"))
      .toDF("u", "t", "s")
    val out = AbsorbingMarkov.absorptionProbability(ev, "u", Seq("t"), "s",
        absorbing = "P", iterations = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out("P") == ((0L, 1.0)))
    assert(out("A")._1 == 2L && approx(out("A")._2, 0.75))
    assert(out("B")._1 == 2L && approx(out("B")._2, 0.75))
  }

  test("absorptionProbability: unreachable state stays at zero") {
    val ev = Seq((1, 1, "A"), (1, 2, "A"), (2, 1, "P"), (2, 2, "P"))
      .toDF("u", "t", "s")
    val out = AbsorbingMarkov.absorptionProbability(ev, "u", Seq("t"), "s",
        absorbing = "P", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("A") == 0.0 && out("P") == 1.0)
  }

  test("haarEnergyShares: 2-level hand fold — fine spike vs coarse step") {
    // [1, 3, 2, 2]: level-1 details (1-3, 2-2) -> sum d^2 = 4; level-2
    // detail (4-4) -> 0; all energy at the fine scale
    val spike = Seq((1, 1L), (2, 3L), (3, 2L), (4, 2L)).toDF("o", "v")
    val s1 = Wavelet.haarEnergyShares(spike, "o", "v", levels = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).longValueExact, r.getDouble(3)))
      .toMap
    assert(s1(1L) == ((2L, 4L, 1.0)) && s1(2L) == ((1L, 0L, 0.0)))
    // [0, 0, 4, 4]: a regime shift — zero fine energy, all coarse
    val step = Seq((1, 0L), (2, 0L), (3, 4L), (4, 4L)).toDF("o", "v")
    val s2 = Wavelet.haarEnergyShares(step, "o", "v", levels = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getDecimal(2).longValueExact, r.getDouble(3))).toMap
    assert(s2(1L) == ((0L, 0.0)) && s2(2L) == ((64L, 1.0)))
  }

  test("haarEnergyShares: wrong series length raises") {
    val bad = Seq((1, 1L), (2, 2L), (3, 3L)).toDF("o", "v")
    intercept[Exception] {
      Wavelet.haarEnergyShares(bad, "o", "v", levels = 2).collect()
    }
  }

  test("jlVector: signs match the reference hash parity and the map is " +
      "linear") {
    val df = Seq((1L, Array.fill(8)(0f).updated(2, 1f)),
      (2L, Array.fill(8)(0f).updated(2, 2f))).toDF("id", "vec")
    val out = df.select(col("id"),
        RandomProjection.jlVector(col("vec"), inDims = 8, outDims = 4)
          .as("y"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // e_3 (1-based j=3): y_i = sign(i, 3) / 2
    (0 until 4).foreach { i =>
      val s = if (refH32(s"jl:$i:3") % 2 == 0) 1.0 else -1.0
      assert(out(1L)(i) == s / 2.0, s"dim $i")
      assert(out(2L)(i) == 2.0 * out(1L)(i), "linearity")
    }
  }

  test("distortionHistogram: ratios concentrate near 1 (JL lemma) and " +
      "every bucket is consistent with its mean") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 120L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val out = RandomProjection.distortionHistogram(vecs.toDF("id", "vec"),
        "id", "vec", inDims = 64, outDims = 16, modA = 3, modB = 5)
      .collect()
    val n = out.map(_.getLong(1)).sum
    val mean = out.map(r => r.getDouble(2) * r.getLong(1)).sum / n
    assert(n > 100, s"enough sampled pairs, got $n")
    assert(mean > 0.7 && mean < 1.3, s"overall mean ratio $mean")
    out.foreach { r =>
      val b = r.getLong(0)
      assert(r.getDouble(2) >= b / 10.0 - 1e-9 &&
        r.getDouble(2) < (b + 1) / 10.0 + 1e-9, s"bucket $b mean in range")
    }
  }

  test("countMinHeavyChangeAudit: exact movers rank first and CMS never " +
      "underestimates; a collision-free width is exact") {
    // item 1: 10 -> 0 (change 10); item 2: 1 -> 8 (7); item 3: 2 -> 2 (0)
    val ev = (1 to 10).map(i => (1L, i.toLong)) ++
      Seq((2L, 5L)) ++ (11 to 18).map(i => (2L, i.toLong)) ++
      Seq((3L, 1L), (3L, 2L), (3L, 19L), (3L, 20L))
    // ts range 1..20 -> mid = 10: first half ts <= 10
    val df = ev.toDF("item", "ts")
    val out = Sketches.countMinHeavyChangeAudit(df, "item", "ts", k = 3,
        depth = 4, width = 1024)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "rank by change")
    out.foreach { r =>
      assert(r.getLong(4) >= r.getLong(1) && r.getLong(5) >= r.getLong(2),
        "CMS estimates never underestimate")
      assert(r.getLong(4) == r.getLong(1) && r.getLong(5) == r.getLong(2),
        "collision-free width is exact")
    }
    assert(out.head.getLong(3) == 10L && out.head.getLong(6) == 10L)
  }

  test("entropyLDiversity: uniform class hits ln(l), single-value class " +
      "hits zero") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g1", "y"),
      ("g2", "x"), ("g2", "x"), ("g2", "x")).toDF("qi", "v")
    val out = Privacy.entropyLDiversity(df, Seq(col("qi")), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("g1")._1 == 4L && out("g1")._2 == 2L &&
      approx(out("g1")._3, math.log(2.0)))
    assert(out("g2")._1 == 3L && out("g2")._2 == 1L &&
      approx(out("g2")._3, 0.0))
  }
}
