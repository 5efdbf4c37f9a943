package graft.ext

import graft.SparkTestBase

class EmbeddingsSpec extends SparkTestBase {
  import spark.implicits._

  test("quantizeInt8: max element hits ±127, zero stays 0, all-zero vector safe") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Embeddings.quantizeInt8(df, "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getSeq[Long](3))).toMap
    val (scale1, q1) = out(1L)
    assert(approx(scale1, 1.0))
    assert(q1 == Seq(64L, -127L, 0L, 32L)) // 0.5*127=63.5 → HALF_UP 64
    val (scale2, q2) = out(2L)
    assert(scale2 == 0.0 && q2 == Seq(0L, 0L, 0L, 0L))
  }

  test("quantizeStats matches a hand-computed summary") {
    val df = Seq((1L, Seq(0.5f, -1.0f, 0.0f, 0.25f))).toDF("vec_id", "embedding")
    val r = Embeddings.quantizeStats(df, "vec_id", "embedding").collect().head
    assert(r.getLong(0) == 1L && approx(r.getDouble(1), 1.0))
    assert(r.getLong(2) == 64L - 127L + 0L + 32L)
    assert(r.getLong(3) == -127L && r.getLong(4) == 64L)
  }

  test("dequantization error is bounded by scale/254 per element") {
    val df = Seq((1L, Seq(0.83f, -0.12f, 0.47f, -0.99f, 0.003f)))
      .toDF("vec_id", "embedding")
    val r = Embeddings.quantizeInt8(df, "embedding").collect().head
    val orig = r.getSeq[Float](1)
    val scale = r.getDouble(2)
    val q = r.getSeq[Long](3)
    orig.zip(q).foreach { case (x, qi) =>
      val deq = qi * scale / 127.0
      assert(math.abs(deq - x) <= scale / 254.0 + 1e-9, s"$x vs $deq")
    }
  }
}
