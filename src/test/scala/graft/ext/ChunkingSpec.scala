package graft.ext

import graft.SparkTestBase

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunk boundaries: coverage, overlap and short tail") {
    // 100 tokens, size 50, stride 40 → starts 1, 41, 81; lengths 50, 50, 20
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = 50, stride = 40)
      .orderBy("chunk_idx").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 1L, 50L), (2L, 41L, 50L), (3L, 81L, 20L)))
    // consecutive chunks overlap by size - stride = 10 tokens and the union
    // covers every token exactly
    val spans = out.map(r => (r.getLong(2), r.getLong(2) + r.getLong(3) - 1))
    spans.sliding(2).foreach { case Array((_, e1), (s2, _)) =>
      assert(e1 - s2 + 1 == 10)
    }
    assert(spans.head._1 == 1 && spans.last._2 == 100)
  }

  test("documents at or under the window yield exactly one chunk") {
    val out = Chunking.chunk(
      Seq((1L, "a b c"), (2L, (1 to 50).mkString(" ")))
        .toDF("doc_id", "text"), "doc_id", "text", 50, 40).collect()
    assert(out.length == 2)
    assert(out.forall(_.getLong(1) == 1L))
    assert(out.map(r => r.getLong(0) -> r.getLong(3)).toMap ==
      Map(1L -> 3L, 2L -> 50L))
  }

  test("chunk_sig is the md5 prefix of the joined token window") {
    val out = Chunking.chunk(Seq((1L, "x y z")).toDF("doc_id", "text"),
      "doc_id", "text", 2, 2).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def sig(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(out.map(r => (r.getLong(2), r.getString(4))).toSeq ==
      Seq((1L, sig("x y")), (3L, sig("z"))))
  }
}
