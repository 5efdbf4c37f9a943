package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a planted 25-token shared run is recovered exactly on both docs") {
    val shared = words("dup", 25)
    val docs = Seq(
      (1L, words("a", 10) + " " + shared + " " + words("b", 5)),
      (2L, words("c", 3) + " " + shared + " " + words("d", 12)),
      (3L, words("e", 40))
    ).toDF("doc_id", "text")
    val runs = SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 20).collect()
    assert(runs.length == 1)
    val r = runs.head
    assert(r.getAs[Long]("d1") == 1L && r.getAs[Long]("d2") == 2L)
    // doc1: run starts after the 10-token prefix, at position 11
    assert(r.getAs[Int]("s1") == 11 && r.getAs[Int]("e1") == 35)
    // doc2: after the 3-token prefix, at position 4
    assert(r.getAs[Int]("s2") == 4 && r.getAs[Int]("e2") == 28)
    assert(r.getAs[Int]("run_len") == 25)
    val spans = SubstringDedup.mergedSpans(docs, "doc_id", "text",
        k = 8, minLen = 20)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.toSeq == Seq((1L, 11, 35, 25), (2L, 4, 28, 25)))
  }

  test("gramHash twin is differential with the string-key path on the " +
      "sf0.001 corpus (spans, stats, and self-repeat runs), and its " +
      "shuffled key is the 16-byte (h1, h2) struct") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def spanSet(hash: Boolean) =
      SubstringDedup.mergedSpans(docs, "doc_id", "text",
          k = 8, minLen = 20, maxDf = 64, gramHash = hash)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val strSpans = spanSet(false)
    assert(strSpans.nonEmpty, "fixture corpus produced no spans")
    assert(spanSet(true) == strSpans, "hashed-gram spans != string-key spans")
    def selfRuns(hash: Boolean) =
      SubstringDedup.duplicateRuns(docs, "doc_id", "text",
          k = 8, minLen = 20, maxDf = 64, includeSelf = true,
          gramHash = hash)
        .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          r.getAs[Int]("s1"), r.getAs[Int]("e1"), r.getAs[Int]("s2"),
          r.getAs[Int]("e2"), r.getAs[Long]("n_anchors"))).toSet
    assert(selfRuns(true) == selfRuns(false),
      "hashed-gram self-repeat runs != string-key runs")
    // the hashed path's join key must be the two-long (h1, h2) struct —
    // never the gram string
    val plan = SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 20, gramHash = true).queryExecution.optimizedPlan
    val keyTypes = plan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.flatMap(_.condition).flatMap(_.references)
      .filter(_.name == "g").map(_.dataType).distinct
    assert(keyTypes.nonEmpty, "no join keyed on the gram column found")
    keyTypes.foreach {
      case st: org.apache.spark.sql.types.StructType =>
        assert(st.fieldNames.toSeq == Seq("h1", "h2"))
      case other => fail(s"hashed path shuffles a $other gram key, " +
        "expected struct<h1,h2>")
    }
  }

  test("runs shorter than minLen are dropped") {
    val shared = words("dup", 15)
    val docs = Seq(
      (1L, shared + " " + words("a", 10)),
      (2L, words("b", 10) + " " + shared)
    ).toDF("doc_id", "text")
    assert(SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 20).count() == 0)
    assert(SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 15).count() == 1) // one run for the (1,2) pair
  }

  test("overlapping spans from different partners merge per doc") {
    // doc 1 shares tokens 1..25 with doc 2 and tokens 16..45 with doc 3:
    // its merged span is 1..45
    val w = (1 to 60).map(i => s"w$i")
    val docs = Seq(
      (1L, w.mkString(" ")),
      (2L, (w.take(25) ++ Seq("zz1", "zz2", "zz3", "zz4", "zz5", "zz6",
        "zz7", "zz8")).mkString(" ")),
      (3L, (Seq("yy1", "yy2") ++ w.slice(15, 45)).mkString(" "))
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.mergedSpans(docs, "doc_id", "text",
        k = 8, minLen = 20)
      .filter(col("doc_id") === 1L).orderBy("span_start").collect()
      .map(r => (r.getInt(1), r.getInt(2)))
    assert(spans.toSeq == Seq((1, 45)))
  }

  test("dedupStats reports tokens removed and the per-doc rate") {
    val shared = words("dup", 30)
    val docs = Seq(
      (1L, shared + " " + words("a", 30)), // 60 tokens, 30 dup
      (2L, shared), // 30 tokens, all dup
      (3L, words("c", 10))
    ).toDF("doc_id", "text")
    val got = SubstringDedup.dedupStats(docs, "doc_id", "text",
        k = 8, minLen = 20)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 1L, 30L, 60L, 0.5), (2L, 1L, 30L, 30L, 1.0)))
  }

  test("grams hotter than maxDf are dropped (stop-gram rule)") {
    val boiler = words("hot", 10)
    val docs = (1L to 6L).map(i =>
      (i, boiler + " " + words(s"u$i", 15))).toDF("doc_id", "text")
    // boilerplate 10-gram run appears in 6 docs; df cap 3 kills its anchors
    assert(SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 10, maxDf = 3).count() == 0)
    assert(SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 10, maxDf = 10).count() == 15) // C(6,2) pairs
  }

  test("within-doc repetition alone yields no runs by default; " +
      "includeSelf surfaces it as d1 = d2 runs") {
    val rep = words("r", 12)
    val docs = Seq((1L, rep + " " + rep + " " + rep)).toDF("doc_id", "text")
    assert(SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 10).count() == 0)
    val self = SubstringDedup.duplicateRuns(docs, "doc_id", "text",
        k = 8, minLen = 10, includeSelf = true)
      .collect()
    assert(self.nonEmpty)
    assert(self.forall(r => r.getAs[Long]("d1") == 1L &&
      r.getAs[Long]("d2") == 1L))
    // each run's later occurrence sits diag tokens after the earlier one
    assert(self.forall(r => r.getAs[Int]("s1") > r.getAs[Int]("s2")))
  }

  test("a planted tail-repeat is recovered exactly with includeSelf and " +
      "its spans merge into the same per-doc table") {
    // doc 1: 10 unique + R(25) + 5 unique + R(25) again → self-run of 25
    // tokens at diag 30; doc 2 is unrelated
    val r25 = words("rep", 25)
    val docs = Seq(
      (1L, words("a", 10) + " " + r25 + " " + words("b", 5) + " " + r25),
      (2L, words("z", 40))
    ).toDF("doc_id", "text")
    val runs = SubstringDedup.duplicateRuns(docs, "doc_id", "text",
        k = 8, minLen = 20, includeSelf = true).collect()
    assert(runs.length == 1)
    val r = runs.head
    assert(r.getAs[Long]("d1") == 1L && r.getAs[Long]("d2") == 1L)
    assert(r.getAs[Int]("s2") == 11 && r.getAs[Int]("e2") == 35)
    assert(r.getAs[Int]("s1") == 41 && r.getAs[Int]("e1") == 65)
    assert(r.getAs[Int]("run_len") == 25)
    val spans = SubstringDedup.mergedSpans(docs, "doc_id", "text",
        k = 8, minLen = 20, includeSelf = true)
      .orderBy("doc_id", "span_start").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2)))
    // both occurrences land in the one span table (non-adjacent → 2 spans)
    assert(spans.toSeq == Seq((1L, 11, 35), (1L, 41, 65)))
  }

  test("self pairing is multiplicity-capped: a gram repeated more than " +
      "maxSelfOcc times in one doc is dropped from self pairs") {
    val r = words("r", 12)
    // 12-token block repeated 12 times → every interior 8-gram occurs ~12
    // times within the doc
    val docs = Seq((1L, Seq.fill(12)(r).mkString(" "))).toDF("doc_id", "text")
    assert(SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 10, includeSelf = true, maxSelfOcc = 3).count() == 0)
    assert(SubstringDedup.duplicateRuns(docs, "doc_id", "text",
      k = 8, minLen = 10, includeSelf = true, maxSelfOcc = 20).count() > 0)
  }

  test("removeSpans places no broadcast hint on the span table (it " +
      "scales with dup mass — AQE decides at runtime)") {
    val docs = Seq((1L, words("a", 30)), (2L, words("a", 30)))
      .toDF("doc_id", "text")
    val plan = SubstringDedup.removeSpans(docs, "doc_id", "text")
      .queryExecution.analyzed
    val hints = plan.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    // the only surviving hints are the df-cap stop-gram anti-join's (a
    // bounded Zipf-head table, one instance per anchor-join side); the
    // span table — whose output carries the __spans interval list — must
    // stay unhinted
    assert(hints.nonEmpty)
    hints.foreach { h =>
      assert(h.child.output.map(_.name) == Seq("g"),
        s"unexpected broadcast hint over ${h.child.output.map(_.name)}")
    }
  }

  test("removeSpans cuts exactly the merged spans and reassembles in " +
      "order; a fully-duplicated doc vanishes from the output") {
    val shared = words("dup", 30)
    val docs = Seq(
      (1L, words("a", 5) + " " + shared + " " + words("b", 4)),
      (2L, shared), // all 30 tokens removed
      (3L, words("c", 10))
    ).toDF("doc_id", "text")
    val got = SubstringDedup.removeSpans(docs, "doc_id", "text",
        k = 8, minLen = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(1L) == ((9L, words("a", 5) + " " + words("b", 4))))
    assert(!got.contains(2L), "fully-removed doc must drop out")
    assert(got(3L) == ((10L, words("c", 10))))
  }

  test("plan shape passes ScaleGuard in fail mode (partitioned windows, " +
      "no cartesian)") {
    val docs = Seq((1L, words("a", 30)), (2L, words("a", 30)))
      .toDF("doc_id", "text")
    spark.conf.set(graft.plans.ScaleGuard.FailConf, "true")
    try {
      graft.plans.ScaleGuard.check(spark)(
        SubstringDedup.dedupStats(docs, "doc_id", "text")
          .queryExecution.analyzed)
    } finally spark.conf.unset(graft.plans.ScaleGuard.FailConf)
  }
}
