package graft.ext

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), // key 10 at t=100
    (2L, 10L, 250L),
    (3L, 20L, 50L), // key 20 before any right row
    (4L, 20L, 400L),
    (5L, 30L, 999L) // key absent from right entirely
  ).toDF("event_id", "k", "t")

  private def right = Seq(
    (10L, 100L, "a"), // exactly at left t=100 → matched (inclusive)
    (10L, 200L, "b"),
    (10L, 300L, "c"), // after every left row of key 10
    (20L, 400L, "d")
  ).toDF("rk", "rt", "payload")

  test("asOf picks the most recent right row at or before each left time") {
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(
      1L -> Some("a"), // inclusive bound at equal timestamps
      2L -> Some("b"), // 200 <= 250 < 300
      3L -> None, // no right row yet
      4L -> Some("d"), // equal timestamp again
      5L -> None // key never appears on the right
    ))
  }

  test("asOf keeps every left row exactly once and all left columns") {
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("event_id", "k", "t", "payload"))
  }

  test("payload name collision with a left column is rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right.withColumnRenamed("payload", "t"),
        "k", "rk", "t", "rt", Seq("t"))
    }
  }

  test("asOfChunked equals asOf on a single-key whale fixture across chunks") {
    // one whale key: 400 left events and 60 right rows spread over ~10 chunks
    // (chunkMs = 1000), including chunks with no right rows at all so the
    // cross-chunk tail carry actually exercises multi-chunk gaps
    val ls = (0 until 400).map(i => (i.toLong, 1L, (i * 104729 % 10000).toLong))
    val rs = (0 until 60).map(j => (1L, (j * 15485863 % 3000).toLong, j.toLong))
    val l = ls.toDF("event_id", "k", "t")
    val r = rs.toDF("rk", "rt", "rid")
    assert(rs.map(_._2).distinct.size == rs.size, "fixture needs unique rt")
    val plain = AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", Seq("rid"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    val chunked = AsOfJoin.asOfChunked(l, r, "k", "rk", "t", "rt", Seq("rid"),
        chunkMs = 1000L)
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    assert(chunked == plain)
  }

  test("asOfChunked equals asOf on multi-key data and odd chunk widths") {
    val ls = (0 until 300).map { i =>
      (i.toLong, (i * 7919 % 5).toLong, (i * 104729 % 1000).toLong)
    }
    val rs = (0 until 120).map { j =>
      (j * 6101 % 5L, (j * 15485863 % 1000).toLong, j.toLong)
    }
    val l = ls.toDF("event_id", "k", "t")
    val r = rs.toDF("rk", "rt", "rid")
    for (chunkMs <- Seq(7L, 100L, 999L, 100000L)) {
      val plain = AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", Seq("rid"))
        .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
      val chunked = AsOfJoin.asOfChunked(l, r, "k", "rk", "t", "rt", Seq("rid"), chunkMs)
        .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
      assert(chunked == plain, s"chunkMs=$chunkMs")
    }
  }

  test("differential vs brute force on a pseudo-random fixture") {
    // deterministic pseudo-random events/states over a handful of keys
    val ls = (0 until 300).map { i =>
      (i.toLong, (i * 7919 % 5).toLong, (i * 104729 % 1000).toLong)
    }
    val rs = (0 until 120).map { j =>
      (j * 6101 % 5L, (j * 15485863 % 1000).toLong, j.toLong)
    }
    val l = ls.toDF("event_id", "k", "t")
    val r = rs.toDF("rk", "rt", "rid")
    val got = AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", Seq("rid"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    // brute force: max rt <= t per key, tie-broken like the window (last row wins
    // among equal rt — make rt unique per key to sidestep the ambiguity)
    val rByKey = rs.groupBy(_._1)
    val expected = ls.map { case (id, k, t) =>
      val cands = rByKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
      id -> (if (cands.isEmpty) -1L else cands.maxBy(c => (c._2, c._3))._3)
    }.toMap
    val rtUnique = rs.groupBy(x => (x._1, x._2)).forall(_._2.size == 1)
    assert(rtUnique, "fixture must have unique (key, rt) for a deterministic oracle")
    assert(got == expected)
  }
}
