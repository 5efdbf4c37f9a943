package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProductQuantSpec extends SparkTestBase {
  import spark.implicits._

  // 16-dim vectors, m=2 subspaces of 8: codewords chosen so sub-assignments
  // are independent per subspace
  private def cw(v: Float): Seq[Float] = Seq.fill(8)(v)
  private val codebook = Seq(
    (0L, cw(0f) ++ cw(0f)),
    (1L, cw(10f) ++ cw(10f))).toDF("code", "cvec")

  test("encode: exact codeword hits score zero error; mixed vectors pick " +
      "different codes per subspace") {
    val corpus = Seq(
      (100L, cw(0f) ++ cw(0f)),    // code (0, 0), exact
      (101L, cw(10f) ++ cw(10f)),  // code (1, 1), exact
      (102L, cw(1f) ++ cw(9f)),    // nearer 0 in sub 0, nearer 1 in sub 1
      (103L, cw(5f) ++ cw(5f)))    // equidistant: tie → smaller code
      .toDF("vec_id", "embedding")
    val codes = ProductQuant.encode(corpus, "vec_id", "embedding",
        codebook, "code", "cvec", m = 2, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(codes((100L, 0)) == ((0L, 0.0)) && codes((100L, 1)) == ((0L, 0.0)))
    assert(codes((101L, 0)) == ((1L, 0.0)) && codes((101L, 1)) == ((1L, 0.0)))
    assert(codes((102L, 0))._1 == 0L && codes((102L, 1))._1 == 1L)
    assert(codes((102L, 0))._2 == 8.0 && codes((102L, 1))._2 == 8.0)
    // 8 dims × 5² each side: exact tie, smaller code id must win
    assert(codes((103L, 0))._1 == 0L && codes((103L, 1))._1 == 0L)
  }

  test("codebookSummary pools population and MSE per cell") {
    val corpus = Seq(
      (100L, cw(1f) ++ cw(1f)), (101L, cw(2f) ++ cw(2f)),
      (102L, cw(9f) ++ cw(9f)))
      .toDF("vec_id", "embedding")
    val out = ProductQuant.codebookSummary(corpus, "vec_id", "embedding",
        codebook, "code", "cvec", m = 2, subDim = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // cell (s, 0) holds the 1s and 2s: mse = (8·1 + 8·4)/2 = 20
    (0 to 1).foreach { s =>
      assert(out((s, 0L)) == ((2L, 20.0)), s"cell ($s, 0): ${out((s, 0L))}")
      assert(out((s, 1L)) == ((1L, 8.0)), s"cell ($s, 1): ${out((s, 1L))}")
    }
  }

  test("adcTopK: a corpus row equal to the query scores distance 0 and " +
      "ranks first; ADC equals true distance when vectors sit on codewords") {
    val corpus = Seq(
      (100L, cw(0f) ++ cw(0f)),
      (101L, cw(10f) ++ cw(10f)),
      (102L, cw(0f) ++ cw(10f)))
      .toDF("vec_id", "embedding")
    val query = cw(0f) ++ cw(0f)
    val top = ProductQuant.adcTopK(corpus, "vec_id", "embedding",
        codebook, "code", "cvec", query, k = 3, m = 2, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.head == ((100L, 0.0)))
    // on-codeword corpus → ADC is the exact squared L2 to the query
    val byId = top.toMap
    assert(byId(102L) == 8 * 100.0, s"got ${byId(102L)}")
    assert(byId(101L) == 16 * 100.0, s"got ${byId(101L)}")
  }

  test("adcTopK at a 256-codeword × m=8 book gates OFF the literal fold: " +
      "join-shaped plan, results match a driver-side exact ADC reference") {
    val m = 8; val subDim = 8; val d = m * subDim
    val rnd = new scala.util.Random(42)
    val book = (0L until 256L).map(c =>
      (c, Seq.fill(d)(rnd.nextFloat() * 10f)))
    val vecs = (0L until 300L).map(i =>
      (i, Seq.fill(d)(rnd.nextFloat() * 10f)))
    val query = Seq.fill(d)(rnd.nextFloat() * 10f)
    val bigBook = book.toDF("code", "cvec")
    val corpus = vecs.toDF("vec_id", "embedding")
    val out = ProductQuant.adcTopK(corpus, "vec_id", "embedding",
      bigBook, "code", "cvec", query, k = 20, m = m, subDim = subDim)
    // above AdcFoldMaxCodes the plan must be the broadcast-join shape,
    // never a 256×8-literal projection
    assert(256 > ProductQuant.AdcFoldMaxCodes)
    assert(out.queryExecution.optimizedPlan.toString.contains("Join"),
      "expected the broadcast-join ADC shape at 256 codewords")
    val got = out.collect().map(r => (r.getLong(0), r.getDouble(1)))
    // driver-side exact reference replicating the engine's fold order:
    // per-subspace left-fold sq L2, (d2, code) tie-break, DECIMAL(18,9)
    // per-term rounding before the sum
    def sq(a: Seq[Float], b: Seq[Float], lo: Int): Double =
      (0 until subDim).foldLeft(0.0) { (acc, i) =>
        val dd = a(lo + i).toDouble - b(lo + i).toDouble; acc + dd * dd
      }
    def sqQ(b: Seq[Float], lo: Int): Double =
      (0 until subDim).foldLeft(0.0) { (acc, i) =>
        val dd = query(lo + i).toDouble - b(lo + i).toDouble; acc + dd * dd
      }
    val expected = vecs.map { case (id, v) =>
      val dist = (0 until m).map { s =>
        val lo = s * subDim
        val best = book.map { case (c, cw) => (sq(v, cw, lo), c) }.min
        new java.math.BigDecimal(sqQ(book(best._2.toInt)._2, lo))
          .setScale(9, java.math.RoundingMode.HALF_UP)
      }.reduce(_.add(_))
      (id, dist.doubleValue)
    }.sortBy { case (id, dd) => (dd, id) }.take(20)
    assert(got.toSeq == expected,
      s"join-path ADC diverged from the exact reference:\n${got.toSeq}\nvs\n$expected")
  }

  test("adcTopK fold and join paths are bit-equal at the gate boundary; " +
      "small books keep the single-scan fold plan") {
    val m = 2; val subDim = 8; val d = m * subDim
    val rnd = new scala.util.Random(7)
    val book = (0L until ProductQuant.AdcFoldMaxCodes.toLong).map(c =>
      (c, Seq.fill(d)(rnd.nextFloat() * 10f))).toDF("code", "cvec")
    val corpus = (0L until 200L).map(i =>
      (i, Seq.fill(d)(rnd.nextFloat() * 10f))).toDF("vec_id", "embedding")
    val query = Seq.fill(d)(rnd.nextFloat() * 10f)
    val fold = ProductQuant.adcTopK(corpus, "vec_id", "embedding",
      book, "code", "cvec", query, k = 200, m = m, subDim = subDim)
    assert(!fold.queryExecution.optimizedPlan.toString.contains("Join"),
      "a 64-codeword book must keep the scan-side literal fold (no join)")
    val joined = ProductQuant.adcTopKJoin(corpus, "vec_id", "embedding",
      book, "code", "cvec", query, k = 200, excludeId = -1L,
      m = m, subDim = subDim)
    val f = fold.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val j = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(f == j, "fold vs join ADC paths diverged on identical inputs")
  }

  test("the fold-vs-join decision never materializes an oversized book on " +
      "the driver: a 1M-row \"codebook\" routes to the join path after a " +
      "bounded LIMIT probe") {
    val acc = spark.sparkContext.longAccumulator("cbRowsTouched")
    val huge = spark.range(0L, 1000000L).map { i =>
      acc.add(1L)
      (i, Seq.fill(16)(0.5f))
    }.toDF("code", "cvec")
    assert(!ProductQuant.foldEligible(huge),
      "a 1M-row book must fail fold eligibility")
    // limit(65).count() caps every scan task at 65 rows: with 32
    // partitions the probe touches at most ~2k rows of the million. A
    // collect-first decision would have touched all 1e6.
    assert(acc.value < 100000L,
      s"the eligibility probe consumed ${acc.value} rows of a 1M-row book " +
        "— the decision is materializing the codebook")
    val small = Seq((0L, Seq.fill(16)(0f)), (1L, Seq.fill(16)(10f)))
      .toDF("code", "cvec")
    assert(ProductQuant.foldEligible(small))
  }

  test("dimension mismatch raises loudly instead of truncating") {
    val bad = Seq((1L, Seq.fill(12)(1f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      ProductQuant.encode(bad, "vec_id", "embedding", codebook, "code",
        "cvec", m = 2, subDim = 8).collect()
    }
    assert(ex.getMessage != null)
  }

  test("dimTruncationFidelity: full-dim row is exactly zero; hand example " +
      "at the half split") {
    // pair (0, 1): first half identical, second half orthogonal-ish
    val docs = Seq(
      (0L, Seq(1f, 0f, 1f, 0f)),
      (1L, Seq(1f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.dimTruncationFidelity(docs, "vec_id", "embedding",
        dims = Seq(2, 4), fullDim = 4)
      .orderBy("dims").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // cos_2 = 1 (identical prefixes); cos_4 = 1/2; err = 1/2 within the
    // DECIMAL(18,9) pooling grid
    assert(out(0)._1 == 2L && out(0)._2 == 1L &&
      math.abs(out(0)._3 - 0.5) < 1e-9)
    assert(out(1) == ((4L, 1L, 0.0)))
  }
}
