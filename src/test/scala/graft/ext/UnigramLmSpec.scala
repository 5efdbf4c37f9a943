package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkTestBase {
  import UnigramLm._

  private def jmap(m: Map[String, Double]) = {
    val jm = new java.util.HashMap[String, java.lang.Double]()
    m.foreach { case (k, v) => jm.put(k, java.lang.Double.valueOf(v)) }
    jm
  }

  // --------------------------------------------------------------------------
  // Viterbi kernel, hand-computed lattices
  // --------------------------------------------------------------------------

  test("viterbi picks the higher-likelihood segmentation") {
    val lp = jmap(Map("a" -> -1.0, "b" -> -1.5, "ab" -> -1.2))
    assert(viterbi("ab", lp, 5) == List("ab")) // -1.2 beats -2.5
    val lp2 = jmap(Map("a" -> -1.0, "b" -> -1.5, "ab" -> -3.0))
    assert(viterbi("ab", lp2, 5) == List("a", "b")) // -2.5 beats -3.0
  }

  test("viterbi exact score ties break to the longest piece") {
    val lp = jmap(Map("a" -> -1.0, "aa" -> -2.0))
    // a+a = -2.0 == aa = -2.0 → longest wins
    assert(viterbi("aa", lp, 5) == List("aa"))
  }

  test("viterbi scores out-of-alphabet chars with UnkLogp and still " +
    "segments around them") {
    val lp = jmap(Map("a" -> -1.0, "ab" -> -1.5))
    assert(viterbi("axb", lp, 5).size == 3) // a, <unk x>, b-as-unk? b unseen too
    // an in-vocab path beats a path through unknowns
    assert(viterbi("ab", lp, 5) == List("ab"))
  }

  test("maxPieceLen truncates the lattice: a longer vocab piece is unusable") {
    val lp = jmap(Map("a" -> -1.0, "aaaa" -> -0.5))
    assert(viterbi("aaaa", lp, 2) == List("a", "a", "a", "a"))
  }

  // --------------------------------------------------------------------------
  // Independent single-threaded reference trainer — deliberately a DIFFERENT
  // implementation shape from the engine: plain mutable Maps, for-loops over
  // a word list, and a Viterbi that scans piece lengths ASCENDING with >=
  // acceptance (the same longest-piece tie rule reached from the opposite
  // scan direction). The differential below is a genuine cross-check.
  // --------------------------------------------------------------------------
  private def refViterbi(word: String, lp: Map[String, Double],
                         maxLen: Int): List[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    for (i <- 1 to n; l <- 1 to math.min(i, maxLen)) {
      val piece = word.substring(i - l, i)
      val sc = lp.get(piece) match {
        case Some(p)          => best(i - l) + p
        case None if l == 1   => best(i - 1) + UnkLogp
        case None             => Double.NegativeInfinity
      }
      if (sc != Double.NegativeInfinity && sc >= best(i)) {
        best(i) = sc; back(i) = l
      }
    }
    var out = List.empty[String]
    var pos = n
    while (pos > 0) { out = word.substring(pos - back(pos), pos) :: out; pos -= back(pos) }
    out
  }

  private def refLogp(counts: Seq[(String, Long)]): Map[String, Double] = {
    val eff = counts.map { case (p, c) => (p, if (p.length == 1) c + 1 else c) }
    val total = eff.map(_._2).sum
    eff.map { case (p, c) =>
      p -> (math.log(c.toDouble) - math.log(total.toDouble))
    }.toMap
  }

  private def refTrain(texts: Seq[String], cfg: Config): Seq[(String, Long)] = {
    val wf = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- texts; w <- t.split(" ") if w.nonEmpty) wf(w) += 1L
    val words = wf.toSeq.filter(_._2 >= cfg.minFreq)
    val sub = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(cfg.maxPieceLen, w.length - i))
      sub(w.substring(i, i + l)) += f
    val chars = sub.toSeq.filter(_._1.length == 1)
    val charSet = chars.map(_._1).toSet
    val multis = sub.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(cfg.seedMulti)
    var vocab: Seq[(String, Long)] = chars ++ multis
    def em(): Unit = {
      val lp = refLogp(vocab)
      val cnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, f) <- words; p <- refViterbi(w, lp, cfg.maxPieceLen)) cnt(p) += f
      vocab = charSet.toSeq.sorted.map(c => (c, cnt.getOrElse(c, 0L))) ++
        cnt.toSeq.filter { case (p, c) => p.length > 1 && c > 0 }
    }
    for (_ <- 1 to cfg.emIters) em()
    var nMulti = vocab.count(_._1.length > 1)
    while (nMulti > cfg.targetMulti) {
      val keep = math.max(cfg.targetMulti, nMulti * 3 / 4)
      vocab = vocab.filter(_._1.length == 1) ++
        vocab.filter(_._1.length > 1).sortBy { case (p, c) => (-c, p) }.take(keep)
      for (_ <- 1 to cfg.emIters) em()
      nMulti = vocab.count(_._1.length > 1)
    }
    vocab.sortBy { case (p, c) => (-c, p) }
  }

  // deterministic 100-doc bilingual corpus (the BpeTrainSpec fixture shape)
  private val poolAa = Vector("banana", "bandana", "nab", "ban", "dan", "anna")
  private val poolBb = Vector("terse", "tree", "street", "test", "rest", "steer")
  private def sampleDocs: Seq[(Long, String, String)] =
    (0 until 100).map { i =>
      val (lang, pool) = if (i % 2 == 0) ("aa", poolAa) else ("bb", poolBb)
      val words = (0 until (i % 5 + 3)).map(j => pool((i + 2 * j) % pool.size))
      (i.toLong, words.mkString(" "), lang)
    }

  private val cfg = Config(maxPieceLen = 4, seedMulti = 30, targetMulti = 10,
    emIters = 2, minFreq = 1)

  test("100-doc differential: distributed train matches the reference " +
      "trainer piece-for-piece, count-for-count, logp bit-for-bit") {
    import spark.implicits._
    val docs = sampleDocs.toDF("doc_id", "text", "lang")
    val got = UnigramLm.train(docs, "text", cfg)
    val ref = refTrain(sampleDocs.map(_._2), cfg)
    assert(got.map(p => (p.piece, p.count)) == ref,
      s"vocab drifted:\ngot  ${got.map(p => (p.piece, p.count))}\nref  $ref")
    val refLp = refLogp(ref)
    got.foreach { p =>
      assert(p.logp == refLp(p.piece), // bitwise: same longs, same formula
        s"logp drift for ${p.piece}: ${p.logp} vs ${refLp(p.piece)}")
    }
    assert(got.map(_.rank) == (1 to got.size))
  }

  test("100-doc differential: distributed encode matches per-doc reference " +
      "token counts over the trained vocabulary") {
    import spark.implicits._
    val docs = sampleDocs.toDF("doc_id", "text", "lang")
    val pieces = UnigramLm.train(docs, "text", cfg)
    val lp = pieces.map(p => p.piece -> p.logp).toMap
    val expected = sampleDocs.map { case (id, text, _) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      id -> ((ws.map(w => refViterbi(w, lp, cfg.maxPieceLen).size.toLong).sum,
        ws.length.toLong))
    }.toMap
    val got = UnigramLm.encode(docs, "doc_id", "text", pieces, cfg.maxPieceLen)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 100)
    assert(got == expected, s"first diffs: ${got.toSeq.sortBy(_._1)
      .filter(kv => expected(kv._1) != kv._2).take(5)}")
  }

  test("trained vocabulary covers the alphabet and hits the target size") {
    import spark.implicits._
    val docs = sampleDocs.toDF("doc_id", "text", "lang")
    val pieces = UnigramLm.train(docs, "text", cfg)
    val corpus = sampleDocs.flatMap(_._2.replace(" ", "")).toSet
    val vocabChars = pieces.filter(_.piece.length == 1).map(_.piece.head).toSet
    assert(corpus.subsetOf(vocabChars), s"missing chars: ${corpus -- vocabChars}")
    assert(pieces.count(_.piece.length > 1) <= cfg.targetMulti)
    assert(pieces.count(_.piece.length > 1) > 0, "no multi-char piece survived")
  }

  test("the learned pieces compress the training language: fertility on a " +
      "seen language is below 1 + chars-per-word and below the unseen one") {
    import spark.implicits._
    val aaOnly = sampleDocs.filter(_._3 == "aa").toDF("doc_id", "text", "lang")
    val pieces = UnigramLm.train(aaOnly, "text", cfg)
    val all = sampleDocs.toDF("doc_id", "text", "lang")
    val enc = UnigramLm.encode(all, "doc_id", "text", pieces, cfg.maxPieceLen)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def fert(lang: String): Double = {
      val rows = sampleDocs.filter(_._3 == lang).map(d => enc(d._1))
      rows.map(_._1).sum.toDouble / rows.map(_._2).sum
    }
    assert(fert("aa") < fert("bb"),
      s"aa-trained tokenizer should fragment bb more: ${fert("aa")} vs ${fert("bb")}")
  }
}
