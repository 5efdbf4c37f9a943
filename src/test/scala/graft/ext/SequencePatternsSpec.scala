package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SequencePatternsSpec extends SparkTestBase {
  import spark.implicits._

  test("firstOccurrenceTriples: hand-computed motifs with repeats and ties") {
    val ev = Seq(
      // user 1: A@1 B@2 C@3 (a later repeat of A must not add motifs)
      (1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L), (1L, "A", 9L),
      // user 2: B@1 A@2 C@3
      (2L, "B", 1L), (2L, "A", 2L), (2L, "C", 3L),
      // user 3: A and B tie at t=1 → type name breaks the tie (A before B)
      (3L, "B", 1L), (3L, "A", 1L), (3L, "C", 5L),
      // user 4: only two types → no triple
      (4L, "A", 1L), (4L, "C", 2L))
      .toDF("u", "ty", "ms")
    val out = SequencePatterns.firstOccurrenceTriples(ev, "u", "ty",
        col("ms"), k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(out(("A", "B", "C")) == 2L, s"users 1 and 3: $out")
    assert(out(("B", "A", "C")) == 1L, "user 2")
    assert(out.size == 2, s"exactly two motifs: $out")
  }

  test("firstOccurrenceTriples is bounded by types^3, not events^3") {
    // one user, 1000 events over 3 types → still just one motif row
    val ev = (0 until 1000).map(i => (1L, Seq("A", "B", "C")(i % 3), i.toLong))
      .toDF("u", "ty", "ms")
    val out = SequencePatterns.firstOccurrenceTriples(ev, "u", "ty",
      col("ms"), k = 100).collect()
    assert(out.length == 1)
    assert((out.head.getString(0), out.head.getString(1),
      out.head.getString(2)) == (("A", "B", "C")))
  }
}
