package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("gopherSignals flags repetitive text and keeps diverse text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "a varied document with many different interesting words inside it")
    ).toDF("doc_id", "text")
    val out = TextQuality.gopherSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    val (n1, ttr1, top1, dup1, keep1) = out(1L)
    assert(n1 == 10 && approx(ttr1, 0.1) && approx(top1, 1.0))
    assert(approx(dup1, 1.0 - 1.0 / 9.0, 1e-5)) // 9 bigrams, 1 distinct
    assert(!keep1)
    val (n2, ttr2, top2, dup2, keep2) = out(2L)
    assert(n2 == 10 && approx(ttr2, 1.0) && approx(top2, 0.1) && approx(dup2, 0.0))
    assert(keep2)
  }

  test("topNgrams ranks by document frequency with ngram tie-break") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x y w"), (3L, "x y v"), (4L, "p q r")
    ).toDF("doc_id", "text")
    val out = TextQuality.topNgrams(docs, "doc_id", "text", k = 2, topN = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    assert(out.head == (1L, "x y", 3L)) // in 3 docs
    // the rest are all df=1 → ordered alphabetically
    assert(out.map(_._2).toSeq == Seq("x y", "p q", "q r"))
  }

  test("unigramNll: common-token docs score lower than rare-token docs") {
    val docs = Seq(
      (1L, "the the the the"), // most frequent token → low nll
      (2L, "the the rare rare"),
      (3L, "unique singleton tokens here") // all rare → high nll
    ).toDF("doc_id", "text")
    val out = TextQuality.unigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus: the=6, rare=2, unique/singleton/tokens/here=1 each, total=12
    assert(out(1L)._1 == 4 && approx(out(1L)._2, -math.log(6.0 / 12.0), 1e-5))
    assert(out(3L)._2 > out(2L)._2 && out(2L)._2 > out(1L)._2)
  }

  test("contamination scores a benchmark near-copy ~1 and unrelated text 0") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta iota"), // near-copy
      (2L, "totally different content with no overlap at all")
    ).toDF("doc_id", "text")
    val out = TextQuality.contamination(docs, bench, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val (n1, h1, c1) = out(1L)
    assert(n1 == 6 && h1 == 5 && approx(c1, 5.0 / 6.0, 1e-5))
    assert(out(2L) == (6L, 0L, 0.0)) // 8 tokens → 6 trigrams, none shared
  }

  test("contaminationBloom: superset of exact hits, false-hit rate near stated fpp") {
    // every doc gets 30 tokens unique to it → ~2800 non-member shingle probes,
    // enough mass to measure the false-hit rate against fpp
    def text(docId: Int) = (0 until 30).map(t => s"w${docId}_$t").mkString(" ")
    val bench = (0 until 10).map(i => (1000L + i, text(1000 + i))).toDF("doc_id", "text")
    val corpus = ((0 until 100).map(i => (i.toLong, text(i))) :+
      (500L, text(1000))).toDF("doc_id", "text") // doc 500 copies bench doc 1000
    val fpp = 0.01
    val exact = TextQuality.contamination(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bloom = TextQuality.contaminationBloom(corpus, bench, "doc_id", "text",
        fpp = fpp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (id, (nsh, nhit)) =>
      assert(bloom(id)._1 == nsh, s"doc $id n_sh drifted")
      // a Bloom filter has no false negatives
      assert(bloom(id)._2 >= nhit, s"doc $id bloom ${bloom(id)._2} < exact $nhit")
    }
    // the planted benchmark copy is fully contaminated under both operators
    assert(exact(500L)._2 == exact(500L)._1 && bloom(500L)._2 == bloom(500L)._1)
    val falseHits = exact.keys.map(id => bloom(id)._2 - exact(id)._2).sum
    val nonMember = exact.values.map { case (nsh, nhit) => nsh - nhit }.sum
    val rate = falseHits.toDouble / nonMember
    assert(rate <= 5 * fpp, s"false-hit rate $rate >> fpp $fpp ($falseHits/$nonMember)")
  }

  test("redactPii replaces every class; piiCounts counts them") {
    val docs = Seq(
      (1L, "mail a.b@x.io twice a.b@x.io phone 555-123-4567"),
      (2L, "ssn 123-45-6789 and card 4111 1111 1111 1111"),
      (3L, "clean text")
    ).toDF("doc_id", "text")
    val red = docs.select(col("doc_id"),
        TextQuality.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "mail <EMAIL> twice <EMAIL> phone <PHONE>")
    assert(red(2L) == "ssn <SSN> and card <CARD>")
    assert(red(3L) == "clean text")
    val counts = TextQuality.piiCounts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(counts(1L) == (2L, 0L, 0L, 1L))
    assert(counts(2L) == (0L, 1L, 1L, 0L))
    assert(counts(3L) == (0L, 0L, 0L, 0L))
  }

  test("repetitionSignals: looping text saturates, diverse text scores zero") {
    val docs = Seq(
      (1L, "spam ham eggs spam ham eggs spam ham eggs"), // every trigram repeats-ish
      (2L, "one two three four five six seven eight nine"), // all trigrams unique
      (3L, "a b") // shorter than k → single partial shingle, no dups
    ).toDF("doc_id", "text")
    val out = TextQuality.repetitionSignals(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // doc 1 trigrams: "spam ham eggs"×3 (len 13), "ham eggs spam"×2 (13),
    // "eggs spam ham"×2 (13) → w_total = 7·13 = 91, all duplicated → frac 1.0
    assert(out(1L)._1 == 91L && out(1L)._2 == 91L)
    assert(approx(out(1L)._3, 1.0))
    assert(approx(out(1L)._4, 0.428571)) // top trigram: count 3 · len 13, round 6
    assert(out(2L)._2 == 0L && approx(out(2L)._3, 0.0))
    assert(out(3L)._1 == 3L && out(3L)._2 == 0L) // "a b" single shingle, len 3
  }

  test("containmentPairs: asymmetric — short bench doc inside a long page") {
    // bench doc's 3 shingles all appear in corpus doc 10 (pasted verbatim
    // inside a longer page) → containment 1.0 even though Jaccard is low;
    // corpus doc 11 shares nothing.
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "intro words here alpha beta gamma delta epsilon outro words trail tail"),
      (11L, "completely different content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = TextQuality.containmentPairs(docs, bench, "doc_id", "text",
      k = 3, threshold = 0.5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 100L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L) // all 3 bench shingles hit
    assert(approx(r.getDouble(4), 1.0))
  }

  test("containmentPairs: threshold drops partial overlaps") {
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text") // 4 shingles
    val docs = Seq((10L, "a b c z z z")).toDF("doc_id", "text") // shares only "a b c"
    val strict = TextQuality.containmentPairs(docs, bench, "doc_id", "text",
      k = 3, threshold = 0.5).collect()
    assert(strict.isEmpty) // 1/4 = 0.25 < 0.5
    val loose = TextQuality.containmentPairs(docs, bench, "doc_id", "text",
      k = 3, threshold = 0.25).collect()
    assert(loose.length == 1 && approx(loose.head.getDouble(4), 0.25))
  }

  // reference implementation of the engine's md5-bucket weight, for goldens
  private def refWeight(feat: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(feat.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val bucket = java.lang.Long.parseLong(hex, 16) % 4096
    (bucket % 997).toDouble / 996.0 - 0.5
  }

  test("hashedLinearScore: uni+bigram feature count and hand-computed score") {
    val df = Seq((1L, "the quick fox"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextQuality.hashedLinearScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // 3 tokens → 3 unigrams + 2 bigrams
    assert(out(1L)._1 == 5L)
    assert(out(2L)._1 == 1L)
    val feats = Seq("the", "quick", "fox", "the_quick", "quick_fox")
    val raw = feats.map(refWeight).sum / feats.length
    assert(approx(out(1L)._2, math.round(raw * 1e6) / 1e6, 1e-9))
    assert(approx(out(1L)._3,
      math.round(1.0 / (1.0 + math.exp(-raw)) * 1e6) / 1e6, 1e-9))
    // scores are probabilities
    assert(out.values.forall(v => v._3 > 0.0 && v._3 < 1.0))
  }

  test("bigramNll: hand-computed interpolated probabilities") {
    // corpus: "a b", "a b", "a c" → c2(a,b)=2, c2(a,c)=1; c1 a=3,b=2,c=1; N=6
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextQuality.bigramNll(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nllAb = -math.log(0.7 * (2.0 / 3) + 0.3 * (2.0 / 6))
    val nllAc = -math.log(0.7 * (1.0 / 3) + 0.3 * (1.0 / 6))
    assert(out(1L)._1 == 1L && approx(out(1L)._2, nllAb, 1e-6))
    assert(out(2L)._2 == out(1L)._2)
    assert(approx(out(3L)._2, nllAc, 1e-6))
    // the rarer continuation really is more surprising
    assert(out(3L)._2 > out(1L)._2)
  }

  test("bigramNll: single-token docs contribute no bigrams and drop out") {
    val df = Seq((1L, "alone"), (2L, "two words")).toDF("doc_id", "text")
    val out = TextQuality.bigramNll(df, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert(out.head.getLong(1) == 1L)
  }

  test("nllRetentionCurve: tiers partition the corpus, cumulative counts are " +
    "monotone and the final token share is exactly 1") {
    // 10 docs: common-word docs rank first (low NLL), rare-word docs last
    val docs = (0 until 8).map(i => (i.toLong, "a a a b")) ++
      Seq((8L, "z q"), (9L, "w v u t s"))
    val out = TextQuality.nllRetentionCurve(docs.toDF("doc_id", "text"),
        "doc_id", "text", buckets = 5)
      .orderBy(col("tier")).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L))
    assert(out.map(_.getLong(1)).sum == 10L) // every doc in exactly one tier
    val cumDocs = out.map(_.getLong(3))
    val cumToks = out.map(_.getLong(4))
    assert(cumDocs.toSeq == cumDocs.sorted.toSeq && cumDocs.last == 10L)
    assert(cumToks.toSeq == cumToks.sorted.toSeq && cumToks.last == 39L)
    assert(out.last.getDouble(5) == 1.0)
    // NLL cutoffs rise with the tier (the curve is a valid filter table)
    val cuts = out.map(_.getDouble(2))
    assert(cuts.zip(cuts.tail).forall { case (a, b) => a <= b })
    // the common-word docs all fall in earlier tiers than the rare-word docs
    assert(cuts.head < cuts.last)
  }
}
