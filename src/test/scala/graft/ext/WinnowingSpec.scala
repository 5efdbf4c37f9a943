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

  test("fused kernel == declarative window form on a pseudo-random corpus " +
      "(profile and pairs), including short-doc boundaries") {
    // deterministic corpus: word soup with deliberate shared passages and
    // docs straddling the no-k-gram (< k) / no-full-window (< k+w−1) edges
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(seed: Long, n: Int): String = {
      val rng = new scala.util.Random(seed) // fixed-seed: deterministic
      (0 until n).map(_ => words(rng.nextInt(10))).mkString(" ")
    }
    val docs = ((0L until 40L).map(i => (i, doc(i, 8 + (i % 13).toInt))) ++
      Seq((100L, "abcdefg"),            // len 7 < k: no k-grams
          (101L, "abcdefgh"),           // len 8 = k: grams but no full window
          (102L, "abcdefghij"),         // len 10 = k+w-2: still no full window
          (103L, "abcdefghijk"),        // len 11 = k+w-1: exactly one window
          (104L, doc(77L, 60) + " " + doc(5L, 12)))) // shared passage w/ doc 5
      .toDF("doc_id", "text")
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.toList
    val profF = Winnowing.fingerprintProfile(docs, "doc_id", "text", k, w)
      .orderBy("doc_id").collect().map(key).toList
    val profD = Winnowing.fingerprintProfileDeclarative(
        docs, "doc_id", "text", k, w)
      .orderBy("doc_id").collect().map(key).toList
    assert(profF == profD, "profile fused vs declarative")
    assert(!profF.exists(r => Seq(100L, 101L, 102L).contains(
      r.head.asInstanceOf[Long])), "short docs excluded")
    assert(profF.exists(_.head == 103L), "one-window doc present")
    val pairsF = Winnowing.similarPairs(docs, "doc_id", "text", k, w,
        minShared = 2, maxDf = 30)
      .orderBy("id_a", "id_b").collect().map(key).toList
    val pairsD = Winnowing.similarPairsDeclarative(docs, "doc_id", "text",
        k, w, minShared = 2, maxDf = 30)
      .orderBy("id_a", "id_b").collect().map(key).toList
    assert(pairsF == pairsD, "pairs fused vs declarative")
    assert(pairsF.nonEmpty, "shared passages should pair")
  }

  test("winnow_keys registered in SQL; keys ascending and distinct") {
    graft.GraftExtensions.register(spark)
    val rows = spark.sql(
      "SELECT winnow_keys('the quick brown fox jumps over the lazy dog', " +
        "8, 4) AS ks")
      .collect().head.getSeq[Long](0)
    assert(rows.nonEmpty)
    assert(rows == rows.sorted && rows.distinct == rows)
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
