package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  test("encodeWord: maximal munch takes the longest piece at each position") {
    val v = new java.util.HashSet[java.lang.String]()
    Seq("a", "b", "c", "ab", "abc", "bc").foreach(v.add)
    // "abcbc": abc | bc  (not ab|c|bc or a|bc|bc)
    assert(WordPiece.encodeWord("abcbc", v, 3) == ((2L, 0L)))
    // "abab": ab | ab
    assert(WordPiece.encodeWord("abab", v, 3) == ((2L, 0L)))
    // greedy is NOT optimal and that's the contract: vocab {aa, aab}
    val v2 = new java.util.HashSet[java.lang.String]()
    Seq("a", "aa", "aab", "b").foreach(v2.add)
    // "aaab": aa | ab? no 'ab' -> aa | a | b = 3 tokens (optimal aab after a
    // would give a|aab = 2, but greedy grabs aa first)
    assert(WordPiece.encodeWord("aaab", v2, 3) == ((3L, 0L)))
  }

  test("encodeWord: positions with no match emit single-char UNK tokens") {
    val v = new java.util.HashSet[java.lang.String]()
    Seq("ab").foreach(v.add)
    // "xabx": x(unk) | ab | x(unk)
    assert(WordPiece.encodeWord("xabx", v, 2) == ((3L, 2L)))
    // all-unk word
    assert(WordPiece.encodeWord("zz", v, 2) == ((2L, 2L)))
  }

  test("encode: per-doc token/word/unk accounting") {
    val vocab = Seq("a", "b", "ab", "ba")
    val docs = Seq(
      (1L, "ab ba abba"),   // 1 + 1 + 2 tokens, 3 words
      (2L, ""),             // empty doc
      (3L, "xy ab")         // 2 unk + 1, 2 words
    ).toDF("doc_id", "text")
    val got = WordPiece.encode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((4L, 3L, 0L)))
    assert(got(2L) == ((0L, 0L, 0L)))
    assert(got(3L) == ((3L, 2L, 2L)))
  }

  // independent greedy replay (recursive shape, like the oracle's CTE walk)
  private def refEncode(w: String, vocab: Set[String], maxLen: Int): (Long, Long) = {
    def longestAt(pos: Int): Option[Int] =
      (math.min(maxLen, w.length - pos) to 1 by -1)
        .find(l => vocab.contains(w.substring(pos, pos + l)))
    @annotation.tailrec
    def walk(pos: Int, n: Long, unk: Long): (Long, Long) =
      if (pos >= w.length) (n, unk)
      else longestAt(pos) match {
        case Some(l) => walk(pos + l, n + 1, unk)
        case None => walk(pos + 1, n + 1, unk + 1)
      }
    walk(0, 0L, 0L)
  }

  test("seeded differential: engine matches the recursive replay on 300 " +
      "random words over a random vocabulary") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    def rndStr(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val vocab = (alpha.map(_.toString) ++
      (0 until 40).map(_ => rndStr(2 + rnd.nextInt(3)))).distinct
    val vset = vocab.toSet
    val maxLen = vocab.map(_.length).max
    val words = (0 until 300).map(_ => rndStr(1 + rnd.nextInt(12)))
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = WordPiece.encode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == refEncode(w, vset, maxLen),
        s"word $w: got ${got(i.toLong)} expected ${refEncode(w, vset, maxLen)}")
    }
  }

  test("fertilityByGroup: hand-counted fertility per group") {
    val vocab = Seq("a", "b", "ab")
    val docs = Seq(
      (1L, "ab ab", "x"),  // 2 words, 2 tokens, 5 chars
      (2L, "aba", "x"),    // 1 word, 2 tokens (ab|a), 3 chars
      (3L, "b b", "y")     // 2 words, 2 tokens, 3 chars
    ).toDF("doc_id", "text", "lang")
    val got = WordPiece.fertilityByGroup(docs, "doc_id", "text", "lang", vocab)
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("x", 2L, 3L, 4L, 1.333333, 2.0),
      ("y", 1L, 2L, 2L, 1.0, 1.5)))
  }
}
