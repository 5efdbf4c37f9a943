package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 8
  private val w = 4

  test("fingerprint profile: coverage guarantee — every window of w k-grams " +
      "contains a selected position; density near 2/(w+1)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "a completely different document about distributed query engines"))
      .toDF("doc_id", "text")
    val prof = Winnowing.fingerprintProfile(docs, "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    docs.collect().foreach { row =>
      val (id, text) = (row.getLong(0), row.getString(1))
      val nk = text.length - k + 1
      val (gotK, gotF, density) = prof(id)
      assert(gotK == nk.toLong, s"doc $id n_kgrams")
      // winnowing guarantee: one selection per window → at least ⌈(nk−w+1)/w⌉
      // selections, at most nk − w + 1
      assert(gotF >= (nk - w + 1 + w - 1) / w && gotF <= (nk - w + 1).toLong,
        s"doc $id selected $gotF of $nk")
      assert(density > 0.0 && density <= 1.0)
      // expected density 2/(w+1) = 0.4 on hash-random text; generous band
      assert(density > 0.1 && density < 0.8, s"doc $id density $density")
    }
  }

  test("selection set is exactly the rightmost-min of every full window " +
      "(replayed with a per-string reference loop)") {
    val text = "jumps over the lazy dog the quick brown fox jumps over the dog"
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    // reference: same md5-prefix hash via Spark expression, winnowed in Scala
    val hs = docs
      .select(explode(sequence(lit(1), lit(text.length - k + 1))).as("p"))
      .select(col("p").cast("long").as("p"),
        conv(substring(md5(substring(lit(text), col("p"), lit(k))), 1, 8),
          16, 10).cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expected = (w to hs.length).map { e =>
      hs.slice(e - w, e).minBy { case (p, h) => (h, -p) }
    }.toSet
    val got = Winnowing.fingerprintProfile(docs, "doc_id", "text", k, w)
      .collect().head
    assert(got.getLong(2) == expected.size.toLong,
      s"n_fingerprints ${got.getLong(2)} vs reference ${expected.size}")
    assert(got.getLong(4) == expected.map(_._2).min, "fp_min")
  }

  test("similarPairs finds the shared-substring pair and scores containment") {
    val shared = "unmistakably unique shared passage of text nobody else has"
    val docs = Seq(
      (1L, s"first document begins here $shared and then ends differently"),
      (2L, s"second doc other start ... $shared ... closing words differ"),
      (3L, "entirely unrelated content about orbital mechanics and launch"))
      .toDF("doc_id", "text")
    val pairs = Winnowing.similarPairs(docs, "doc_id", "text", k, w,
        minShared = 2, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"pairs: ${pairs.toSeq}")
    val (_, _, nShared, containment) = pairs.head
    // guarantee: a shared substring of length ≥ w + k − 1 = 11 forces at
    // least one shared fingerprint; this passage is far longer
    assert(nShared >= 2 && containment > 0.0 && containment <= 1.0)
  }
}
