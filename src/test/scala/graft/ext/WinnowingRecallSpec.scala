package graft.ext

import graft.SparkTestBase

/** Exact-substring differential for the winnowing dedup stack: on a seeded
  * corpus with planted overlaps, compute the TRUE longest common substring
  * for every pair (quadratic DP — affordable at spec scale, the thing the
  * fingerprint index exists to avoid at corpus scale) and assert both
  * directions of the Schleimer/Wilkerson/Aiken contract:
  *
  *  - GUARANTEE (recall): any pair whose exact LCS is ≥ w + k − 1 shares
  *    at least one selected fingerprint — so with minShared = 1 and the
  *    stop-fingerprint cut disabled, the candidate set DOMINATES the exact
  *    near-dup set. This is the paper's theorem checked against real
  *    output, not a statistical tendency.
  *  - NO PHANTOMS (precision floor): a shared fingerprint IS a shared
  *    k-gram, so every candidate pair has an exact common substring of
  *    length ≥ k (modulo 32-bit hash collisions, absent at this seed).
  */
class WinnowingRecallSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 8
  private val W = 4
  private val T = W + K - 1 // guarantee threshold

  // deterministic corpus: 40 base docs over a word pool + 10 docs each
  // carrying a 15-word span lifted verbatim from its base partner
  private val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(4242)
    val pool = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
      "victor", "whiskey", "xray", "yankee", "zulu", "ampere", "bohr",
      "curie", "dirac", "euler", "fermi", "gauss", "hilbert", "ising",
      "joule", "kelvin", "landau", "maxwell", "noether")
    val base = (0 until 40).map { i =>
      val n = 20 + rnd.nextInt(16)
      i.toLong -> (0 until n).map(_ => pool(rnd.nextInt(pool.size)))
        .mkString(" ")
    }
    val planted = (0 until 10).map { i =>
      val src = base(i)._2.split(" ")
      val start = rnd.nextInt(math.max(src.length - 15, 1))
      val span = src.slice(start, start + 15).mkString(" ")
      val pre = (0 until 5).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
      val post = (0 until 5).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
      (40L + i) -> s"$pre $span $post"
    }
    base ++ planted
  }

  /** Longest common substring length, O(n·m) rolling DP. */
  private def lcs(a: String, b: String): Int = {
    var prev = new Array[Int](b.length + 1)
    var cur = new Array[Int](b.length + 1)
    var best = 0
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        cur(j) = if (a.charAt(i - 1) == b.charAt(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    best
  }

  test("winnowing guarantee: every pair with an exact common substring of " +
      "length >= w+k-1 appears in the candidate set (100% recall on the " +
      "contract's own threshold), and every candidate shares >= k exact chars") {
    val docs = corpus.toDF("doc_id", "text")
    val candidates = Winnowing.similarPairs(docs, "doc_id", "text",
        k = K, w = W, minShared = 1, maxDf = 1000L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val byId = corpus.toMap
    val ids = corpus.map(_._1).sorted
    val exact = for {
      a <- ids; b <- ids if a < b
      l = lcs(byId(a), byId(b)) if l >= T
    } yield ((a, b), l)

    // the corpus genuinely exercises the theorem: planted pairs + whatever
    // the pool produced by chance
    assert(exact.size >= 10, s"fixture too weak: ${exact.size} true pairs")
    val missed = exact.filterNot { case (p, _) => candidates(p) }
    assert(missed.isEmpty,
      s"guarantee violated — pairs with LCS >= $T missing from candidates: " +
        missed.take(5).mkString(", "))

    // precision floor: no candidate without a real shared k-gram
    val phantom = candidates.filter { case (a, b) => lcs(byId(a), byId(b)) < K }
    assert(phantom.isEmpty,
      s"candidates with no shared $K-char substring: ${phantom.take(5)}")

    // and the quantified headline a curation pipeline reads: recall of the
    // DEFAULT config (minShared=2, df cut on) over strong overlaps (>= 2T)
    val defaults = Winnowing.similarPairs(docs, "doc_id", "text", k = K, w = W)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = exact.collect { case (p, l) if l >= 2 * T => p }
    val strongHit = strong.count(defaults)
    assert(strong.nonEmpty && strongHit == strong.size,
      s"default-config recall on strong overlaps: $strongHit/${strong.size}")
  }
}
