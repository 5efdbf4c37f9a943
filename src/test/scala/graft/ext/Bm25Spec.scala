package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hash join hash join hash"),   // tf(hash)=3, dl=5
    (2L, "hash scan filter sort"),      // tf(hash)=1, dl=4
    (3L, "sort filter merge group"),    // no query terms
    (4L, "hash sort filter merge group agg window table line part")) // long
    .toDF("doc_id", "text")

  test("bm25TopK: higher tf wins at comparable length; non-matching docs " +
    "are absent; ranks are dense from 1") {
    val out = Bm25.bm25TopK(docs, "doc_id", "text", Seq("hash", "join"),
      topK = 10).collect()
    val byDoc = out.map(r => r.getLong(1) ->
      (r.getLong(0), r.getLong(2), r.getDouble(3))).toMap
    assert(!byDoc.contains(3L), "doc without any query term must be absent")
    // doc 1 matches both terms with high tf → rank 1
    assert(byDoc(1L)._1 == 1L && byDoc(1L)._2 == 2L)
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("bm25TopK: length normalization — same tf scores lower in a longer " +
    "document") {
    val out = Bm25.bm25TopK(docs, "doc_id", "text", Seq("hash"), topK = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // docs 2 and 4 both have tf(hash)=1; doc 2 (dl=4) must outscore doc 4
    // (dl=10)
    assert(out(2L) > out(4L), s"short doc must outscore long at equal tf: $out")
  }

  test("bm25TopK: hand-computed score on a controlled corpus") {
    // 2 docs, both length 2, term "x" in one → df=1, N=2, avgdl=2, dl=2:
    // idf = ln(1 + (2-1+0.5)/1.5) = ln(2); denom = tf + k1·(1-b+b·1) = 1+1.2
    // score = ln(2)·(1·2.2)/2.2 = ln(2) = 0.693147
    val two = Seq((1L, "x y"), (2L, "a b")).toDF("doc_id", "text")
    val out = Bm25.bm25TopK(two, "doc_id", "text", Seq("x")).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L)
    assert(approx(out.head.getDouble(3), 0.693147, 1e-6))
  }

  test("bm25TopK: topK truncates and keeps the best scores") {
    val many = (1L to 30L).map(i =>
      (i, ("hash " * i.toInt).trim + " " + ("pad " * 3).trim))
      .toDF("doc_id", "text")
    val out = Bm25.bm25TopK(many, "doc_id", "text", Seq("hash"), topK = 5)
      .collect()
    assert(out.length == 5)
    // scores must be non-increasing in rank order
    val scores = out.sortBy(_.getLong(0)).map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("moreLikeThis: an identical document ranks first with cosine 1; " +
    "token-disjoint documents are absent") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),  // identical to the query
      (3L, "alpha beta other words"),  // partial overlap
      (4L, "totally disjoint tokens here")).toDF("doc_id", "text")
    val out = Bm25.moreLikeThis(corpus, "doc_id", "text", queryId = 1L)
      .collect()
    assert(!out.exists(_.getLong(1) == 4L), "disjoint doc must be absent")
    assert(!out.exists(_.getLong(1) == 1L), "query doc excluded from results")
    val top = out.minBy(_.getLong(0))
    assert(top.getLong(1) == 2L && top.getDouble(3) == 1.0)
    val partial = out.find(_.getLong(1) == 3L).get
    assert(partial.getDouble(3) > 0.0 && partial.getDouble(3) < 1.0)
    assert(partial.getLong(2) == 2L, "alpha+beta shared")
  }
}
