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

  // --------------------------------------------------------------------------
  // Independent single-threaded reference encoder (Sennrich et al. apply_bpe:
  // collect adjacent pairs, merge the lowest-rank one everywhere, repeat) —
  // deliberately a DIFFERENT implementation shape (pair-list + minBy) from
  // the engine's index-scan kernel, so the 100-doc differential below is a
  // genuine cross-check, not the same code run twice.
  // --------------------------------------------------------------------------
  private def refEncodeWord(word: String,
                            ranks: Map[(String, String), Int]): Vector[String] = {
    var symbols = word.map(_.toString).toVector :+ BpeTrain.EndOfWord
    var continue = true
    while (continue && symbols.size > 1) {
      val ranked = symbols.zip(symbols.tail)
        .flatMap(p => ranks.get(p).map(r => (r, p)))
      if (ranked.isEmpty) continue = false
      else {
        val (_, (l, r)) = ranked.minBy(_._1)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < symbols.size) {
          if (i + 1 < symbols.size && symbols(i) == l && symbols(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += symbols(i); i += 1 }
        }
        symbols = out.result()
      }
    }
    symbols
  }

  // deterministic 100-doc bilingual corpus: two disjoint word pools so the
  // learned merges fit one "language" and fragment the other
  private val poolAa = Vector("banana", "bandana", "nab", "ban", "dan", "anna")
  private val poolBb = Vector("terse", "tree", "street", "test", "rest", "steer")
  private def sampleDocs: Seq[(Long, String, String)] =
    (0 until 100).map { i =>
      val (lang, pool) = if (i % 2 == 0) ("aa", poolAa) else ("bb", poolBb)
      val words = (0 until (i % 5 + 3)).map(j => pool((i + 2 * j) % pool.size))
      (i.toLong, words.mkString(" "), lang)
    }

  // the FROZEN merge table: trained once from sampleDocs and pinned here, so
  // the encode/fertility differential runs against a fixed vocabulary even if
  // train's tie-breaking ever changes (which the assert below would also flag)
  private val frozenMerges = Seq(
    (1, "a", "n", 250L), (2, "e", "e", 166L), (3, "s", "t", 166L),
    (4, "an", "</w>", 84L), (5, "d", "an</w>", 84L), (6, "e", "st", 84L),
    (7, "ee", "</w>", 84L), (8, "est", "</w>", 84L), (9, "r", "ee</w>", 84L),
    (10, "t", "est</w>", 84L), (11, "t", "ree</w>", 84L), (12, "a", "</w>", 83L)
  ).map { case (rk, l, r, f) => BpeTrain.Merge(rk, l, r, f) }

  test("frozen merge table: train on the 100-doc corpus reproduces it") {
    val docs = sampleDocs.toDF("doc_id", "text", "lang")
    val merges = BpeTrain.train(docs, "text", nMerges = 12, minFreq = 2)
    assert(merges == frozenMerges,
      s"merge table drifted:\n${merges.mkString("\n")}")
  }

  test("local/distributed merge-loop differential: both paths reproduce " +
      "the frozen merge table (the r16 driver-gate twin check)") {
    // train() takes the local path here (vocab << LocalTrainMaxSymbols);
    // drive the distributed loop directly on the same pruned vocab and
    // require the exact same merge sequence, freqs and tie-breaks.
    val docs = sampleDocs.toDF("doc_id", "text", "lang")
    val base = docs
      .select(explode(split(col("text"), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .filter(col("__f") >= 2)
      .as[(String, Long)]
      .map { case (w, f) =>
        BpeTrain.VocabRow(w.map(_.toString) :+ BpeTrain.EndOfWord, f) }
      .localCheckpoint(eager = true)
    val dist = BpeTrain.trainDistributed(base, nMerges = 12)
    base.unpersist()
    assert(dist == frozenMerges,
      s"distributed path drifted:\n${dist.mkString("\n")}")
  }

  test("bestPairLocal breaks freq ties in UTF-8 binary order, matching the " +
      "distributed orderBy (supplementary vs U+F900 tie)") {
    // U+F900 is one UTF-16 unit (0xF900) but three UTF-8 bytes (EF A4 80);
    // U+1F600 is a surrogate pair (first unit 0xD83D < 0xF900) but four
    // UTF-8 bytes (F0 9F 98 80). Java String ordering would pick the emoji
    // on a freq tie; Spark's UTF8String binary ordering picks U+F900. The
    // local path must match the distributed orderBy.
    val bmp = "\uF900"
    val supp = new String(Character.toChars(0x1F600))
    val rows = Array(
      (Array(bmp, "x"), 5L),
      (Array(supp, "x"), 5L))
    val local = BpeTrain.bestPairLocal(rows)
    assert(local.contains((bmp, "x", 5L)),
      s"UTF-8 order puts U+F900 before U+1F600: $local")
    val ds = Seq(
      BpeTrain.VocabRow(Seq(bmp, "x"), 5L),
      BpeTrain.VocabRow(Seq(supp, "x"), 5L)).toDS()
      .localCheckpoint(eager = true)
    val dist = BpeTrain.trainDistributed(ds, nMerges = 1)
    ds.unpersist()
    assert(dist.map(m => (m.left, m.right, m.pair_freq)) ==
      Seq((bmp, "x", 5L)), s"distributed tie-break drifted: $dist")
  }

  test("100-doc differential: distributed encode matches the reference " +
      "encoder per document over the frozen merge table") {
    val docs = sampleDocs.toDF("doc_id", "text", "lang")
    val ranks = frozenMerges.map(m => (m.left, m.right) -> m.rank).toMap
    val expected = sampleDocs.map { case (id, text, _) =>
      val words = text.split(" ").filter(_.nonEmpty)
      id -> ((words.map(w => refEncodeWord(w, ranks).size.toLong).sum,
        words.length.toLong))
    }.toMap
    val got = BpeTrain.encode(docs, "doc_id", "text", frozenMerges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 100)
    assert(got == expected,
      s"first diffs: ${got.toSeq.sortBy(_._1)
        .filter(kv => expected(kv._1) != kv._2).take(5)}")
    // sanity: merges actually compressed the language they fit
    val flat = sampleDocs.map { case (id, _, lang) => lang -> got(id) }
    val aaTok = flat.collect { case ("aa", (t, w)) => (t, w) }
    val fertAa = aaTok.map(_._1).sum.toDouble / aaTok.map(_._2).sum
    assert(fertAa < 3.0, s"aa fertility $fertAa should reflect learned merges")
  }

  test("100-doc differential: fertilityByGroup matches reference aggregation " +
      "by language") {
    val docs = sampleDocs.toDF("doc_id", "text", "lang")
    val ranks = frozenMerges.map(m => (m.left, m.right) -> m.rank).toMap
    val ref = sampleDocs.groupBy(_._3).map { case (lang, rows) =>
      val words = rows.flatMap(_._2.split(" ").filter(_.nonEmpty))
      val nTokens = words.map(w => refEncodeWord(w, ranks).size.toLong).sum
      val nWords = words.size.toLong
      val nChars = rows.map(_._2.length.toLong).sum
      lang -> ((rows.size.toLong, nWords, nTokens,
        nTokens.toDouble / nWords, nChars.toDouble / nTokens))
    }
    val got = BpeTrain.fertilityByGroup(docs, "doc_id", "text", "lang",
        frozenMerges)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set("aa", "bb"))
    ref.foreach { case (lang, (nd, nw, nt, fert, cpt)) =>
      val g = got(lang)
      assert((g._1, g._2, g._3) == ((nd, nw, nt)),
        s"$lang counts: got $g expected ($nd,$nw,$nt)")
      assert(math.abs(g._4 - fert) < 1e-6, s"$lang fertility ${g._4} vs $fert")
      assert(math.abs(g._5 - cpt) < 1e-6, s"$lang chars/token ${g._5} vs $cpt")
    }
  }
}
