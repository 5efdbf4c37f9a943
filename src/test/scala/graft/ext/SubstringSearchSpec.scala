package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SubstringSearchSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a quick brown fox is not a slow red fox at all"),
    (3L, "completely unrelated text about spark query engines"),
    (4L, "the quick brown fox appears here too with more text"),
    (5L, "short")).toDF("doc_id", "text")

  test("index counts equal the brute-force contains scan, and candidates " +
      "always contain the matches") {
    val qs = Seq((10L, "quick brown fox"), (20L, "spark query en"),
      (30L, "zebra stripes!!!")).toDF("qid", "q")
    val out = SubstringSearch.searchCounts(docs, "doc_id", "text",
        qs, "qid", "q", gramLen = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val texts = docs.collect().map(r => r.getString(1))
    def brute(q: String): Long = texts.count(_.contains(q)).toLong
    // exactness: n_matches is the true scan answer per query
    assert(out(10L)._3 == brute("quick brown fox") && out(10L)._3 == 3L)
    assert(out(20L)._3 == brute("spark query en") && out(20L)._3 == 1L)
    // a query matching nothing still reports its candidate set (possibly
    // empty → no row) — zebra shares no 8-gram with any doc
    assert(!out.contains(30L))
    // containment: candidates ⊇ matches, and every candidate really
    // contains the selected gram
    out.foreach { case (qid, (gram, nc, nm)) =>
      assert(nc >= nm, s"query $qid: candidates $nc < matches $nm")
      assert(nc == texts.count(_.contains(gram)).toLong,
        s"query $qid: posting hits != docs containing gram")
    }
  }

  test("the selected gram is the (hash, gram)-argmin of the query's grams " +
      "— deterministic across runs and engines") {
    val qs = Seq((1L, "abcdefghijkl")).toDF("qid", "q")
    val grams = (0 to 4).map(i => "abcdefghijkl".substring(i, i + 8))
    val expected = grams.map { g =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(g).take(8), 16)
      (h, g)
    }.min._2
    val out = SubstringSearch.searchCounts(docs, "doc_id", "text",
      qs, "qid", "q", gramLen = 8)
    // no doc contains any gram of this query → zero rows, so recompute the
    // selection against a doc that does
    val docs2 = docs.union(Seq((9L, "xx abcdefghijkl yy")).toDF("doc_id", "text"))
    val row = SubstringSearch.searchCounts(docs2, "doc_id", "text",
      qs, "qid", "q", gramLen = 8).collect().head
    assert(row.getString(1) == expected)
    assert(row.getLong(2) == 1L && row.getLong(3) == 1L)
    assert(out.count() == 0L)
  }

  test("queries shorter than the gram length are dropped, not mis-indexed") {
    val qs = Seq((1L, "short")).toDF("qid", "q")
    assert(SubstringSearch.searchCounts(docs, "doc_id", "text",
      qs, "qid", "q", gramLen = 8).count() == 0L)
  }
}
