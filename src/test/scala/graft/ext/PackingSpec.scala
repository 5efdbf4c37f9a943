package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Single-threaded reference: running offsets + chunk spans per group. */
  private def reference(rows: Seq[(String, Long, Long)], seqLen: Int)
      : Map[(String, Long), (Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (_, grp) =>
      var off = 0L
      grp.sortBy(_._2).map { case (g, id, n) =>
        val first = off / seqLen
        val last = if (n <= 0) first else (off + n - 1) / seqLen
        val out = (g, id) -> (off, first, last, last - first + 1)
        off += math.max(n, 0)
        out
      }
    }

  private def run(rows: Seq[(String, Long, Long)], seqLen: Int) =
    Packing.packChunks(rows.toDF("source", "doc_id", "n_tokens"),
        "doc_id", "source", "n_tokens", seqLen)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

  test("packChunks: offsets contiguous, spans cover each doc, zero-token docs inert") {
    val rows = Seq[(String, Long, Long)](
      ("a", 1L, 100L), ("a", 2L, 500L), ("a", 3L, 12L), ("a", 4L, 0L), ("a", 5L, 600L),
      ("b", 10L, 256L), ("b", 11L, 1L))
    val got = run(rows, seqLen = 256)
    assert(got == reference(rows, 256))
    // doc 2 starts at 100, ends at 599 → sequences 0..2 of group a
    assert(got(("a", 2L)) == ((100L, 0L, 2L, 3L)))
    // zero-token doc reports its would-be sequence, spans nothing
    assert(got(("a", 4L)) == ((612L, 2L, 2L, 1L)))
    // exact boundary fit: doc 10 fills sequence 0 exactly; doc 11 starts seq 1
    assert(got(("b", 10L)) == ((0L, 0L, 0L, 1L)))
    assert(got(("b", 11L)) == ((256L, 1L, 1L, 1L)))
  }

  test("packChunks matches the reference on random corpora (ScalaCheck)") {
    val row = for {
      g <- Gen.oneOf("g0", "g1", "g2")
      id <- Gen.choose(0L, 500L)
      n <- Gen.choose(0L, 1000L)
    } yield (g, id, n)
    val corpusGen = Gen.zip(Gen.listOfN(60, row), Gen.choose(16, 512))
    (1 to 8).foreach { seed =>
      val (raw, seqLen) = sample(corpusGen, seed.toLong)
      // distinct ids per group (duplicate ids have no defined order)
      val rows = raw.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      assert(run(rows, seqLen) == reference(rows, seqLen), s"seed $seed")
    }
  }

  /** Independent reference for greedy packing: straight fold per group. */
  private def greedyRef(rows: Seq[(String, Long, Long)], seqLen: Int)
      : Map[(String, Long), Long] =
    rows.groupBy(_._1).flatMap { case (_, grp) =>
      var seq = -1L; var acc = 0L
      grp.sortBy(_._2).map { case (g, id, n) =>
        if (seq < 0 || acc + n > seqLen) { seq += 1; acc = n } else acc += n
        (g, id) -> seq
      }
    }

  test("packGreedy: no doc split, sequences fill greedily, oversize docs go alone") {
    val rows = Seq[(String, Long, Long)](
      ("a", 1L, 100L), ("a", 2L, 150L), ("a", 3L, 10L), // fits: seq 0 (260)
      ("a", 4L, 300L), // would overflow 512? 260+300=560 > 256... seqLen=256 below
      ("a", 5L, 999L), // oversize → alone
      ("a", 6L, 1L))
    val got = Packing.packGreedy(rows.toDF("source", "doc_id", "n_tokens"),
        "doc_id", "source", "n_tokens", seqLen = 256)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == greedyRef(rows, 256))
    assert(got(("a", 1L)) == 0L && got(("a", 2L)) == 0L) // 100+150=250 ≤ 256
    assert(got(("a", 3L)) == 1L) // 250+10 > 256 → new sequence
    assert(got(("a", 4L)) == 2L) // 10+300 > 256
    assert(got(("a", 5L)) == 3L) // oversize: alone
    assert(got(("a", 6L)) == 4L) // 999+1 > 256 → next
  }

  test("packGreedy matches the reference fold on random corpora") {
    val row = for {
      g <- Gen.oneOf("g0", "g1", "g2", "g3")
      id <- Gen.choose(0L, 400L)
      n <- Gen.choose(0L, 700L)
    } yield (g, id, n)
    val gen = Gen.zip(Gen.listOfN(80, row), Gen.choose(32, 600))
    (1 to 6).foreach { seed =>
      val (raw, seqLen) = sample(gen, seed.toLong)
      val rows = raw.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val got = Packing.packGreedy(rows.toDF("source", "doc_id", "n_tokens"),
          "doc_id", "source", "n_tokens", seqLen)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
      assert(got == greedyRef(rows, seqLen), s"seed $seed")
    }
  }

  test("packChunks is stable under repartitioning") {
    val rows = (0 until 200).map(i => (s"g${i % 4}", i.toLong, (i * 37 % 400).toLong))
    val df = rows.toDF("source", "doc_id", "n_tokens")
    val a = Packing.packChunks(df, "doc_id", "source", "n_tokens", 128)
      .orderBy("source", "doc_id").collect().toSeq
    val b = Packing.packChunks(df.repartition(7), "doc_id", "source", "n_tokens", 128)
      .orderBy("source", "doc_id").collect().toSeq
    assert(a == b)
  }

  test("padWasteByBucket: CASE-ladder buckets, oversize tier, exact waste") {
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" ")),
      (2L, Seq.fill(20)("w").mkString(" ")),
      (3L, Seq.fill(100)("w").mkString(" ")),
      (4L, Seq.fill(2000)("w").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Packing.padWasteByBucket(docs, "text")
      .orderBy(col("bucket_len")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (-1L, 1L, 2000L, 2000L, 0L, 0.0), // oversize: needs chunking, no padding
      (16L, 1L, 10L, 16L, 6L, 0.375),
      (32L, 1L, 20L, 32L, 12L, 0.375),
      (128L, 1L, 100L, 128L, 28L, 0.21875)))
  }

  test("padWasteByBucket: exact powers of two stay in their own bucket") {
    val docs = Seq((1L, Seq.fill(32)("w").mkString(" "))).toDF("doc_id", "text")
    val out = Packing.padWasteByBucket(docs, "text").collect()
    assert(out.length == 1 && out.head.getLong(0) == 32L &&
      out.head.getLong(4) == 0L) // 2^ceil(log2 32) float drift would say 64
  }
}
