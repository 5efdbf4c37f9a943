package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points = Seq(
    (1L, 10L, 100L), (2L, 10L, 199L), (3L, 10L, 200L), // 200 = exclusive end
    (4L, 20L, 150L), // other key
    (5L, 10L, 5000L) // far outside every interval
  ).toDF("pid", "k", "t")

  private def intervals = Seq(
    (100L, 10L, 100L, 200L), // [100, 200) on key 10
    (101L, 10L, 150L, 250L), // overlapping interval, same key
    (102L, 20L, 100L, 200L) // key 20
  ).toDF("iid", "ik", "s", "e")

  private def pairs(bucket: Long) = RangeJoin.rangeJoinPairs(
      points, intervals, "k", "ik", "t", "s", "e", bucket)
    .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val expected = Set(
    (1L, 100L), // t=100 inclusive start
    (2L, 100L), (2L, 101L), // t=199 in both key-10 intervals
    (3L, 101L), // t=200 excluded from [100,200), inside [150,250)
    (4L, 102L) // key isolation
  )

  test("range join matches point-in-[start,end) per key, exactly once per pair") {
    assert(pairs(bucket = 100L) == expected)
  }

  test("bucket width does not change the result (tiny and huge buckets)") {
    assert(pairs(bucket = 7L) == expected)
    assert(pairs(bucket = 100000L) == expected)
  }

  test("empty intervals (end <= start) match nothing instead of exploding a descending sequence") {
    val iv = Seq(
      (200L, 10L, 150L, 150L), // empty: [150, 150)
      (201L, 10L, 180L, 120L), // inverted
      (202L, 10L, 100L, 200L) // normal, catches points 1 and 2
    ).toDF("iid", "ik", "s", "e")
    val got = RangeJoin.rangeJoinPairs(points, iv, "k", "ik", "t", "s", "e", 50L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 202L), (2L, 202L)))
  }

  test("an interval spanning more than maxBucketsPerInterval buckets fails fast") {
    val sentinel = Seq((300L, 10L, 0L, Long.MaxValue)).toDF("iid", "ik", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.rangeJoinPairs(points, sentinel, "k", "ik", "t", "s", "e",
        bucketWidth = 100L, maxBucketsPerInterval = 1000L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("rangeJoinPairs")), s"unexpected error: $e")
  }

  test("differential vs the naive inequality join on a pseudo-random fixture") {
    val ps = (0 until 200).map { i =>
      (i.toLong, (i * 7919 % 4).toLong, (i * 104729 % 500).toLong)
    }
    val ivs = (0 until 80).map { j =>
      val s = (j * 15485863 % 500).toLong
      (1000L + j, (j * 6101 % 4).toLong, s, s + 1 + (j * 31 % 60))
    }
    val p = ps.toDF("pid", "k", "t")
    val iv = ivs.toDF("iid", "ik", "s", "e")
    val got = RangeJoin.rangeJoinPairs(p, iv, "k", "ik", "t", "s", "e", bucketWidth = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (pid, k, t) <- ps
      (iid, ik, s, e) <- ivs
      if k == ik && t >= s && t < e
    } yield (pid, iid)).toSet
    assert(got == expected)
  }

  test("intervalOverlapPairs: exactly-once pairs, differential vs naive overlap") {
    val as = (0 until 120).map { i =>
      val s = (i * 15485863 % 400).toLong
      (i.toLong, (i * 7919 % 3).toLong, s, s + 1 + (i * 37 % 90))
    }
    val bs = (0 until 90).map { j =>
      val s = (j * 104729 % 400).toLong
      (500L + j, (j * 6101 % 3).toLong, s, s + 1 + (j * 53 % 90))
    }
    val a = as.toDF("aid", "ak", "sa", "ea")
    val b = bs.toDF("bid", "bk", "sb", "eb")
    // rows, not a set, so duplicate emissions would be caught
    val got = RangeJoin.intervalOverlapPairs(a, b, "ak", "bk",
        "sa", "ea", "sb", "eb", bucketWidth = 64L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = for {
      (aid, ak, sa, ea) <- as
      (bid, bk, sb, eb) <- bs
      if ak == bk && sa < eb && sb < ea
    } yield (aid, bid)
    assert(got.sorted == expected.sorted,
      s"got ${got.size} rows (${got.distinct.size} distinct), expected ${expected.size}")
  }
}
