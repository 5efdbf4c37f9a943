package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed closed forms + invariants for the round-10 modules:
  * residual PQ, power-iteration PCA, binary-segmentation changepoint, SAX
  * motifs, interval concurrency, truncated harmonic centrality, HLL set
  * ops, JSONL round-trip, Bloom pre-join audit.
  */
class OmegaModulesSpec extends SparkTestBase {
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")

  test("binarySegmentSplit finds the obvious break with exact means") {
    // 5 days at 1000, then 5 days at 5000 (cents)
    val rows = (1 to 10).map(d =>
      (day(d), java.math.BigDecimal.valueOf(if (d <= 5) 1000 else 5000)))
    val out = Series.binarySegmentSplit(rows.toDF("day", "x"), "day", "x")
      .collect().head
    assert(out.getDate(0) == day(6), "split at the first right-segment day")
    assert(out.getLong(1) == 5L && out.getLong(2) == 5L)
    assert(approx(out.getDouble(3), 1000.0) && approx(out.getDouble(4), 5000.0))
    // perfect step: split SSE is 0, full SSE = n/4 * (5000-1000)^2 * ... > 0
    assert(approx(out.getDouble(6), 0.0) && out.getDouble(5) > 0.0)
    assert(approx(out.getDouble(7), 1.0), "gain_share = 1 on a perfect step")
  }

  test("binarySegmentSplit on a flat series: zero gain, first-split tie") {
    val rows = (1 to 6).map(d => (day(d), java.math.BigDecimal.valueOf(700)))
    val out = Series.binarySegmentSplit(rows.toDF("day", "x"), "day", "x")
      .collect().head
    assert(out.getDate(0) == day(2), "all costs tie at 0 -> smallest t wins")
    assert(approx(out.getDouble(5), 0.0) && approx(out.getDouble(6), 0.0))
    assert(out.isNullAt(7), "gain undefined on a flat series")
  }

  test("saxMotifs: alternating high/low frames yield the alternating word") {
    // 1-day PAA frames, values alternate far above/below the mean
    val rows = (1 to 12).map(d =>
      (day(d), java.math.BigDecimal.valueOf(if (d % 2 == 0) 1000 else 9000)))
    val out = Series.saxMotifs(rows.toDF("day", "x"), "day", "x",
        paaWidth = 1, wordLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // z alternates ± the same magnitude -> symbols d,a,d,a,... words dad/ada
    assert(out.keySet == Set("dad", "ada"), s"words: $out")
    assert(out.values.sum == 10L, "12 frames -> 10 full words")
  }

  test("intervalConcurrency: hand-counted overlaps, raise on reversed span") {
    val rows = Seq((day(1), day(3)), (day(2), day(5)), (day(4), day(4)))
      .toDF("s", "e")
    val out = EventStats.intervalConcurrency(rows, "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDate(2)))
    // opens: d1=1 d2=2 d3=2 d4=3? no: [1,3],[2,5],[4,4] ->
    // d1:1 d2:2 d3:2 d4:3(=[2,5]+[4,4]... [1,3] closed) -> actually
    // d4 has [2,5],[4,4] = 2. Peak is 2 first reached on day 2.
    assert(out.length == 1)
    assert(out.head._1 == "2024-01" && out.head._2 == 2L &&
      out.head._3 == day(2), s"got ${out.head}")
    val bad = Seq((day(5), day(2))).toDF("s", "e")
    val ex = intercept[Exception] {
      EventStats.intervalConcurrency(bad, "s", "e").collect()
    }
    assert(ex.getMessage.contains("interval ends before start"))
  }

  test("harmonicCentrality on a path graph matches the closed form") {
    // path 1-2-3-4-5-6: seed 1 reaches 2@1, 3@2, 4@3 within 3 hops
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L),
      (5L, 6L, 1L)).toDF("src", "dst", "w")
    val out = GraphPaths.harmonicCentrality(edges, "src", "dst", nSeeds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 1L, 1L, 1.0 + 0.5 + 1.0 / 3.0)))
    // seed 2 reaches 1,3 @1; 4 @2; 5 @3
    assert(out(2L) == ((2L, 1L, 1L, 2.0 + 0.5 + 1.0 / 3.0)))
  }

  test("hllIntersectAudit: estimates track truth; union bounded by parts") {
    val a = (1L to 400L).toDF("k")
    val b = (201L to 600L).toDF("k")
    val r = Sketches.hllIntersectAudit(a, b, "k", b = 6).collect().head
    val (estA, estB, estU, estI) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(r.getLong(5) == 200L, "true intersect")
    // register-max union can never exceed the sum of the parts and never
    // fall below either part
    assert(estU <= estA + estB + 1e-9 && estU >= math.max(estA, estB) - 1e-9)
    // b=6 HLL rel. error ~ 1.04/sqrt(64) = 13%; allow 3 sigma on each term
    assert(math.abs(estA - 400) / 400 < 0.45, s"est_a $estA")
    assert(math.abs(estI - 200) < 250, s"est_intersect $estI far off")
    // identical sets: intersection estimate collapses to the set estimate
    val same = Sketches.hllIntersectAudit(a, a, "k", b = 6).collect().head
    assert(approx(same.getDouble(4), same.getDouble(1), 1e-9))
    assert(approx(same.getDouble(6), 1.0, 1e-9), "jaccard_est of A with A")
  }

  test("bloomPrejoinAudit: no false negatives, row accounting adds up") {
    val dim = (1L to 10L).toDF("pk")
    // fact rows: key k repeated k%3+1 times, keys 1..50
    val facts = (1L to 50L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k))
      .toDF("fk")
    val r = Sketches.bloomPrejoinAudit(facts, col("fk"), dim, col("pk"),
      wWords = 8, kHashes = 3).collect().head
    val nTrue = (1L to 10L).map(k => k % 3 + 1).sum
    val nAll = (1L to 50L).map(k => k % 3 + 1).sum
    assert(r.getLong(0) == nAll && r.getLong(1) == 50L)
    assert(r.getLong(3) == nTrue, "exact semi-join truth")
    // Bloom filters never false-negative: every true row passes
    assert(r.getLong(2) >= r.getLong(3))
    assert(r.getLong(2) == r.getLong(3) + r.getLong(4), "pass = true + fp")
  }

  test("powerIterationTopEig recovers a planted dominant axis") {
    // vectors = a * e1 + tiny noise along the other dims, a in {-8..8}
    val dims = 16
    val rows = (0 until 40).map { i =>
      val a = (i % 17 - 8).toFloat
      (i.toLong, (0 until dims).map { d =>
        if (d == 0) a else 0.01f * ((i * 7 + d) % 5 - 2)
      })
    }
    val out = Embeddings.powerIterationTopEig(
        rows.toDF("vec_id", "embedding"), "embedding", iters = 4,
        dims = dims)
      .collect().sortBy(_.getInt(0))
    val loadings = out.map(_.getDouble(1))
    assert(math.abs(math.abs(loadings(0)) - 1.0) < 0.01,
      s"dominant loading ${loadings(0)}")
    assert(loadings.drop(1).forall(l => math.abs(l) < 0.05),
      "off-axis loadings near zero")
    // unit norm
    assert(approx(loadings.map(l => l * l).sum, 1.0, 1e-9))
    val share = out.head.getDouble(3)
    assert(share > 0.95, s"explained share $share")
    assert(out.map(_.getDouble(2)).distinct.length == 1, "one lambda")
  }

  test("residual PQ beats raw PQ on clustered vectors") {
    val dims = 16
    // two tight clusters far apart; PQ codebook = 4 seed vectors
    def vec(center: Double, off: Int) =
      (0 until dims).map(d => (center + 0.1 * ((off * 13 + d) % 7 - 3)).toFloat)
    val df = ((0 until 20).map(i => (i.toLong, vec(10.0, i))) ++
      (20 until 40).map(i => (i.toLong, vec(-10.0, i))))
      .toDF("vec_id", "embedding")
    val seeds = df.filter(col("vec_id").isin(0L, 20L))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cents = Clustering.lloydCentroids(df, "vec_id", "embedding", seeds,
      "cid", "cvec", iters = 2, dims = dims)
    val resid = ProductQuant.residualVectors(df, "vec_id", "embedding", cents)
    // every vector's residual is near zero (clusters are tight)
    val maxAbs = resid.select(max(aggregate(col("resid"), lit(0.0),
      (acc, x) => greatest(acc, abs(x))))).head().getDouble(0)
    assert(maxAbs < 1.5, s"residual magnitude $maxAbs")
    val cb = df.filter(col("vec_id").isin(0L, 10L, 20L, 30L))
      .select(col("vec_id").as("code"), col("embedding").as("cvec"))
    val rcb = resid.filter(col("vec_id").isin(0L, 10L, 20L, 30L))
      .select(col("vec_id").as("code"), col("resid").as("cvec"))
    val mseRaw = ProductQuant.subspaceMse(ProductQuant.encode(
        df, "vec_id", "embedding", cb, "code", "cvec", m = 4, subDim = 4))
      .agg(sum("mse")).head().getDouble(0)
    val mseRes = ProductQuant.subspaceMse(ProductQuant.encode(
        resid, "vec_id", "resid", rcb, "code", "cvec", m = 4, subDim = 4))
      .agg(sum("mse")).head().getDouble(0)
    assert(mseRes < mseRaw,
      s"residual PQ should cut distortion: $mseRes vs $mseRaw")
  }

  test("jsonlRoundtrip is lossless on exact-text column types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    try {
      val df = Seq((1L, "alpha", day(3)), (2L, "beta|comma, \"quoted\"",
        day(14))).toDF("id", "s", "d")
      val back = graft.sources.Formats.jsonlRoundtrip(df, s"$dir/t")
        .orderBy("id").collect().map(_.toSeq.toList).toList
      assert(back == df.orderBy("id").collect().map(_.toSeq.toList).toList)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
