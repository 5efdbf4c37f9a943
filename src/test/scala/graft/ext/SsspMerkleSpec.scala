package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 batch-13 specs: Bellman-Ford SSSP and the Merkle drill-down. */
class SsspMerkleSpec extends SparkTestBase {
  import spark.implicits._

  // --------------------------------------------------------------------------
  // GraphPaths.ssspWeighted
  // --------------------------------------------------------------------------

  test("sssp: matches a Dijkstra replay once rounds cover the diameter") {
    val rnd = new scala.util.Random(71)
    val edges = (0 until 300).map(_ => (rnd.nextInt(40).toLong,
        rnd.nextInt(40).toLong, 1L + rnd.nextInt(9)))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst", "w")
    val got = GraphPaths.ssspWeighted(df, "src", "dst", "w", rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay: normalized undirected adjacency with min parallel weight
    val norm = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2),
        e._3))
      .groupBy(e => (e._1, e._2)).map { case (k, es) =>
        (k._1, k._2, es.map(_._3).min) }.toSeq
    val adj = norm.flatMap(e => Seq((e._1, (e._2, e._3)),
      (e._2, (e._1, e._3)))).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    val seed = adj.toSeq.map { case (n, vs) => (n, vs.size) }
      .sortBy { case (n, d) => (-d, n) }.head._1
    // Dijkstra
    var dist = Map(seed -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, seed))(
      Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (dist(u) == d)
        adj.getOrElse(u, Seq()).foreach { case (v, w) =>
          if (!dist.contains(v) || d + w < dist(v)) {
            dist += v -> (d + w); pq.enqueue((d + w, v))
          }
        }
    }
    assert(got == dist, s"${got.size} vs ${dist.size}")
  }

  test("sssp: round budget gives the cheapest <=r-edge path, monotone") {
    // path graph 0-1-2-3-4 with unit weights: after 2 rounds only 0..2
    val df = Seq((0L, 1L, 5L), (1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L),
      (0L, 9L, 1L)).toDF("src", "dst", "w")
    // seed: node 0 has degree 2 (max), min id
    val r2 = GraphPaths.ssspWeighted(df, "src", "dst", "w", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(0L -> 0L, 1L -> 5L, 2L -> 10L, 9L -> 1L))
    val r4 = GraphPaths.ssspWeighted(df, "src", "dst", "w", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r4(4L) == 20L && r4(3L) == 15L)
    r2.foreach { case (n, d) => assert(r4(n) <= d, "monotone refinement") }
  }

  test("sssp: parallel edges collapse to the minimum weight") {
    val df = Seq((1L, 2L, 9L), (2L, 1L, 3L), (1L, 2L, 7L))
      .toDF("src", "dst", "w")
    val got = GraphPaths.ssspWeighted(df, "src", "dst", "w", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 3L))
  }

  // --------------------------------------------------------------------------
  // Integrity.merkleDrill
  // --------------------------------------------------------------------------

  private def mkTable(rows: Seq[(Long, Long, String)]) =
    rows.toDF("k", "v", "s")

  test("merkle drill: identical tables produce zero differing buckets") {
    val rows = (1L to 500L).map(k => (k, k * 7, s"x$k"))
    val out = Integrity.merkleDrill(mkTable(rows), mkTable(rows),
      Seq(col("k")), Seq(col("k"), col("v"), col("s")), levels = 3)
      .collect()
    assert(out.count(_.getInt(0) == 1) == 16, "all 16 level-1 buckets")
    assert(out.forall(!_.getBoolean(4)), "no bucket differs")
    assert(out.count(_.getInt(0) > 1) == 0, "no drill below level 1")
  }

  test("merkle drill: a planted edit and a delete surface on the right path") {
    val rows = (1L to 2000L).map(k => (k, k * 7, s"x$k"))
    // edit key 1234's value; delete key 777
    val b = rows.map { case (k, v, s) =>
      if (k == 1234L) (k, v + 1, s) else (k, v, s)
    }.filterNot(_._1 == 777L)
    val out = Integrity.merkleDrill(mkTable(rows), mkTable(b),
      Seq(col("k")), Seq(col("k"), col("v"), col("s")), levels = 3)
      .collect()
    val l1diff = out.filter(r => r.getInt(0) == 1 && r.getBoolean(4))
    assert(l1diff.length >= 1 && l1diff.length <= 2,
      "at most one bucket per planted change")
    // the edited key keeps its count (xor mismatch), the delete drops one
    def khPrefix(k: Long, l: Int): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$k").take(l)
    val editL3 = out.find(r => r.getInt(0) == 3 &&
      r.getString(1) == khPrefix(1234L, 3)).get
    assert(editL3.getBoolean(4) && editL3.getLong(2) == editL3.getLong(3),
      "edit: equal counts, differing xor")
    val delL3 = out.find(r => r.getInt(0) == 3 &&
      r.getString(1) == khPrefix(777L, 3)).get
    assert(delL3.getBoolean(4) &&
      delL3.getLong(2) == delL3.getLong(3) + 1, "delete: count drop")
    // drill restriction: every audited level-l bucket sits under a
    // differing level-(l-1) parent
    val diffByLevel = out.filter(_.getBoolean(4))
      .groupBy(_.getInt(0)).map { case (l, rs) =>
        l -> rs.map(_.getString(1)).toSet }
    out.filter(_.getInt(0) > 1).foreach { r =>
      val parent = r.getString(1).take(r.getInt(0) - 1)
      assert(diffByLevel(r.getInt(0) - 1).contains(parent),
        s"audited ${r.getString(1)} under non-differing parent")
    }
  }

  test("merkle drill: key-hash digest replay matches an independent xor") {
    val rows = (1L to 100L).map(k => (k, k, "z"))
    val out = Integrity.merkleDrill(mkTable(rows), mkTable(rows.take(90)),
      Seq(col("k")), Seq(col("k"), col("v"), col("s")), levels = 1)
      .collect()
    def h(k: Long): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$k|$k|z")
        .take(15), 16)
    def kb(k: Long): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$k").take(1)
    val expectA = rows.groupBy(t => kb(t._1)).map { case (bkt, rs) =>
      bkt -> ((rs.size.toLong, rs.map(t => h(t._1)).reduce(_ ^ _))) }
    out.foreach { r =>
      val (n, _) = expectA(r.getString(1))
      assert(r.getLong(2) == n, s"bucket ${r.getString(1)} count")
    }
    // exactly the buckets holding keys 91..100 differ
    val wantDiff = (91L to 100L).map(kb).toSet
    val gotDiff = out.filter(_.getBoolean(4)).map(_.getString(1)).toSet
    assert(gotDiff == wantDiff)
  }
}
