package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private val log = Seq(
    // key 1: three versions, latest is a plain upsert
    (1L, 10L, "put", "v1"), (1L, 20L, "put", "v2"), (1L, 30L, "put", "v3"),
    // key 2: latest version is a delete → key drops
    (2L, 10L, "put", "x"), (2L, 40L, "del", null.asInstanceOf[String]),
    // key 3: an OLD delete overwritten by a later upsert → key resurrects
    (3L, 10L, "del", null.asInstanceOf[String]), (3L, 50L, "put", "back"),
    // key 4: single version
    (4L, 5L, "put", "solo")
  ).toDF("k", "ver", "op", "payload")

  test("latest version wins, tombstones delete, old tombstones are overwritten") {
    val out = Compaction.compactLatest(log, Seq("k"), Seq("ver", "op"),
        tombstone = col("op") === "del")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(3), r.getLong(4))).toMap
    assert(out.keySet == Set(1L, 3L, 4L))
    assert(out(1L) == ((30L, "v3", 3L)))
    assert(out(3L) == ((50L, "back", 2L)))
    assert(out(4L) == ((5L, "solo", 1L)))
  }

  test("version tiebreak column decides within an equal first component") {
    val dup = Seq((1L, 10L, 100L, "a"), (1L, 10L, 200L, "b"))
      .toDF("k", "ver", "seq", "payload")
    val out = Compaction.compactLatest(dup, Seq("k"), Seq("ver", "seq"),
        tombstone = lit(false))
      .collect()
    assert(out.length == 1 && out(0).getString(3) == "b")
    assert(out(0).getLong(4) == 2L)
  }

  test("composite keys compact independently") {
    val cl = Seq((1L, "a", 1L, "x"), (1L, "b", 1L, "y"), (1L, "a", 2L, "z"))
      .toDF("k1", "k2", "ver", "payload")
    val out = Compaction.compactLatest(cl, Seq("k1", "k2"), Seq("ver"),
        tombstone = lit(false))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(3)).toMap
    assert(out == Map((1L, "a") -> "z", (1L, "b") -> "y"))
  }

  test("incrementalRollup: merge equals full recompute, including delta-only " +
    "and base-only keys") {
    val facts = Seq(
      ("k1", 10L), ("k1", 20L), ("k2", 5L), // history
      ("k1", 7L), ("k3", 100L))             // delta (k3 is a NEW key)
    def mkDelta(rows: Seq[(String, Long)]) = rows.toDF("k", "raw")
      .select(col("k"), col("raw").cast("decimal(38,0)").as("vm"))
    val base = mkDelta(facts.take(3)).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("s"))
    val merged = Compaction
      .incrementalRollup(base, mkDelta(facts.drop(3)), Seq("k"), "vm")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).longValueExact())).toMap
    val full = mkDelta(facts).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("s"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).longValueExact())).toMap
    assert(merged == full)
    assert(merged("k2") == ((1L, 5L)))   // base-only key untouched
    assert(merged("k3") == ((1L, 100L))) // delta-only key created
    assert(merged("k1") == ((3L, 37L)))  // merged counts and sums
  }

  test("incrementalRollup: empty delta is the identity") {
    val base = Seq(("k", 2L, 30L)).toDF("k", "n", "raw")
      .select(col("k"), col("n"), col("raw").cast("decimal(38,0)").as("s"))
    val emptyDelta = Seq.empty[(String, Long)].toDF("k", "raw")
      .select(col("k"), col("raw").cast("decimal(38,0)").as("vm"))
    val out = Compaction.incrementalRollup(base, emptyDelta, Seq("k"), "vm")
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L &&
      out.head.getDecimal(2).longValueExact() == 30L)
  }
}
