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
