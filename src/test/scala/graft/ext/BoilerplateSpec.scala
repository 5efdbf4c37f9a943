package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkBoilerplate: hand-computed doc-frequency cut") {
    // group g1, 4 docs; chunk size 2; threshold 0.5 → boiler iff df >= 2.
    // "a b" appears in docs 1,2,3 (df=3, boiler); "c d" only in doc 1 (df=1);
    // "z" is doc 4's short tail chunk (df=1).
    val docs = Seq(
      (1L, "g1", "a b c d"),
      (2L, "g1", "a b x y"),
      (3L, "g1", "a b"),
      (4L, "g1", "p q z")).toDF("doc_id", "grp", "text")
    val out = Boilerplate.chunkBoilerplate(docs, "grp", "doc_id", "text",
        chunkTokens = 2, minDocFrac = 0.5)
      .orderBy("doc_id").collect()
    // doc 1: chunks [a b][c d] → 1 boiler of 2, 2 of 4 tokens
    assert(out(0).getLong(2) == 2 && out(0).getLong(3) == 1)
    assert(out(0).getDouble(5) == 0.5)
    // doc 3: its only chunk is boilerplate → frac 1.0
    assert(out(2).getLong(2) == 1 && out(2).getDouble(5) == 1.0)
    // doc 4: chunks [p q][z], nothing shared → frac 0.0
    assert(out(3).getLong(2) == 2 && out(3).getLong(4) == 3
      && out(3).getDouble(5) == 0.0)
  }

  test("chunkBoilerplate: doc-frequency is per group, repeats count once") {
    // same chunk in both groups, but g2 has only 1 of 3 docs carrying it →
    // boiler in g1 (2/2), not in g2 (1/3 < 0.5). Doc 10 repeats "a b" twice;
    // df still counts it once, both instances are flagged.
    val docs = Seq(
      (10L, "g1", "a b a b"),
      (11L, "g1", "a b"),
      (20L, "g2", "a b"),
      (21L, "g2", "x y"),
      (22L, "g2", "u v")).toDF("doc_id", "grp", "text")
    val out = Boilerplate.chunkBoilerplate(docs, "grp", "doc_id", "text", 2, 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(out(10L) == 1.0 && out(11L) == 1.0)
    assert(out(20L) == 0.0 && out(21L) == 0.0 && out(22L) == 0.0)
  }

  test("memorizationDepth: deepest shared order wins; no hit → 0") {
    val mk = (id: Long, t: String) => (id, t)
    val train = Seq(
      mk(100L, "the quick brown fox jumps over the lazy dog today"),
      mk(101L, "completely different training text here")).toDF("doc_id", "text")
    val heldout = Seq(
      // shares an 8-gram (verbatim leak)
      mk(1L, "quick brown fox jumps over the lazy dog"),
      // shares 3-grams only ("brown fox jumps" reordered context, max 3..4)
      mk(2L, "a brown fox jumps around walls quietly no dog"),
      // shares nothing at any order
      mk(3L, "zzz yyy xxx www vvv")).toDF("doc_id", "text")
    val out = Boilerplate.memorizationDepth(train, heldout, "doc_id", "text",
        ns = Seq(3, 5, 8))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(4) == 8 && out(0).getBoolean(1) && out(0).getBoolean(3))
    assert(out(1).getInt(4) == 3 && out(1).getBoolean(1) && !out(1).getBoolean(2))
    assert(out(2).getInt(4) == 0 && !out(2).getBoolean(1))
    // every held-out doc appears exactly once
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }
}
