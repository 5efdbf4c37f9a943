package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  // The worked example of Sennrich et al. 2016 §3.2:
  // vocab {low:5, lower:2, newest:6, widest:3}
  private def corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("train reproduces the paper's merge sequence (ties lexicographic)") {
    val merges = BpeTrain.train(corpus, "text", nMerges = 5)
    val got = merges.map(m => (m.rank, m.left, m.right, m.pair_freq))
    // (e,s) and (s,t) and (t,</w>) all have freq 9 -> lexicographic tie-break
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)), s"got $got")
  }

  test("train stops early when no pair remains") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // "ab</w>" fully merges in 2 steps; further merges are impossible
    val merges = BpeTrain.train(tiny, "text", nMerges = 10)
    assert(merges.length == 2)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("ab", "</w>")))
    assert(merges.forall(_.pair_freq == 2L))
  }

  test("minFreq prunes hapax words from the vocabulary") {
    val docs = Seq((1L, "aa aa aa zq")).toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", nMerges = 10, minFreq = 2)
    // only "aa" survives: merges involve a and </w> exclusively
    assert(merges.flatMap(m => Seq(m.left, m.right))
      .forall(s => s.replace("</w>", "").forall(_ == 'a')))
  }

  test("encode applies merges in rank order and counts resulting tokens") {
    val merges = BpeTrain.train(corpus, "text", nMerges = 5)
    // "lowest" -> l o w e s t </w> -> es -> est -> est</w> -> lo -> low
    //   => [low, est</w>] (2 tokens); "newest" -> [n, e, w, est</w>] (4)
    val docs = Seq((1L, "lowest"), (2L, "newest"), (3L, "lowest newest"))
      .toDF("doc_id", "text")
    val out = BpeTrain.encode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 1L)))
    assert(out(2L) == ((4L, 1L)))
    assert(out(3L) == ((6L, 2L)))
  }

  test("applyMerge merges left-to-right without overlap") {
    val v = Seq(BpeTrain.VocabRow(Seq("a", "a", "a"), 1L)).toDS()
    val out = BpeTrain.applyMerge(v, "a", "a").collect().head.symbols
    assert(out == Seq("aa", "a")) // NOT (a, aa): scan is left-to-right
  }

  test("fertilityByGroup: hand-counted tokens per word by language") {
    // With zero merges every word of length L costs L+1 tokens (chars + </w>)
    val docs = Seq(
      (1L, "ab ab", "en"),   // 2 words, 6 tokens, 5 chars
      (2L, "abc", "en"),     // 1 word, 4 tokens, 3 chars
      (3L, "x y", "de")      // 2 words, 4 tokens, 3 chars
    ).toDF("doc_id", "text", "lang")
    val out = BpeTrain.fertilityByGroup(docs, "doc_id", "text", "lang", Nil)
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("de", 1L, 2L, 4L, 2.0, 0.75),
      ("en", 2L, 3L, 10L, 3.333333, 0.8))) // 10/3 through the 6-decimal round
  }

  test("fertilityByGroup: merges lower fertility for the language they fit") {
    val docs = Seq((1L, "aa aa aa", "en"), (2L, "zz zz zz", "de"))
      .toDF("doc_id", "text", "lang")
    val merges = BpeTrain.train(docs.filter(col("lang") === "en"), "text",
      nMerges = 4, minFreq = 1)
    val f = BpeTrain.fertilityByGroup(docs, "doc_id", "text", "lang", merges)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(f("en") < f("de"),
      s"tokenizer trained on en should fragment de more: $f")
  }
}
