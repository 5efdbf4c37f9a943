package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RunsSpec extends SparkTestBase {
  import spark.implicits._

  test("collapseRuns: basic gaps-and-islands with SCD2 bounds") {
    val df = Seq(
      // user 1: A A B A  → runs A(1-2), B(3), A(4)
      (1L, 1L, 101L, "A"), (1L, 2L, 102L, "A"),
      (1L, 3L, 103L, "B"), (1L, 4L, 104L, "A"),
      // user 2: single event
      (2L, 10L, 201L, "X")
    ).toDF("user_id", "ms", "event_id", "event_type")
    val out = Runs.collapseRuns(df, "user_id", "ms", "event_id", "event_type")
      .orderBy("user_id", "run_id")
      .as[(Long, Long, String, Long, Long, Option[Long], Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, "A", 1L, 2L, Some(3L), 2L),
      (1L, 2L, "B", 3L, 3L, Some(4L), 1L),
      (1L, 3L, "A", 4L, 4L, None, 1L),
      (2L, 1L, "X", 10L, 10L, None, 1L)))
  }

  test("collapseRuns: equal timestamps break ties on tieCol deterministically") {
    val df = Seq(
      (1L, 5L, 1L, "A"), (1L, 5L, 2L, "B"), (1L, 5L, 3L, "B")
    ).toDF("user_id", "ms", "event_id", "event_type")
    val out = Runs.collapseRuns(df, "user_id", "ms", "event_id", "event_type")
      .orderBy("run_id").as[(Long, Long, String, Long, Long, Option[Long], Long)]
      .collect().toSeq
    assert(out.map(r => (r._2, r._3, r._7)) == Seq((1L, "A", 1L), (2L, "B", 2L)))
  }

  test("collapseRuns: null values form runs (null-safe comparison)") {
    val df = Seq(
      (1L, 1L, 1L, Some("A")), (1L, 2L, 2L, None), (1L, 3L, 3L, None),
      (1L, 4L, 4L, Some("A"))
    ).toDF("user_id", "ms", "event_id", "event_type")
    val out = Runs.collapseRuns(df, "user_id", "ms", "event_id", "event_type")
      .orderBy("run_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(6)).toSeq == Seq(1L, 2L, 1L)) // n_events per run
    assert(out(1).isNullAt(2)) // the null run's value is null
  }

  test("collapseRuns: n_events sums to input size; intervals nest correctly") {
    val rng = new scala.util.Random(7)
    val df = (0 until 2000).map { i =>
      (rng.nextInt(20).toLong, i.toLong, i.toLong, s"t${rng.nextInt(3)}")
    }.toDF("user_id", "ms", "event_id", "event_type")
    val out = Runs.collapseRuns(df, "user_id", "ms", "event_id", "event_type")
      .collect()
    assert(out.map(_.getLong(6)).sum == 2000L)
    // valid_until (when present) strictly after valid_to's run start and == next valid_from
    val byKey = out.groupBy(_.getLong(0))
    byKey.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) == b.getLong(3)) // valid_until == next valid_from
          assert(a.getLong(4) <= b.getLong(3)) // runs don't overlap
        case _ =>
      }
      assert(sorted.last.isNullAt(5)) // open current interval
    }
  }

  private def dailyDec(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("g", "d", "v")
      .select(col("g"), col("d").cast("date").as("d"),
        col("v").cast("decimal(38,0)").as("v"))
  }

  test("runsTest: perfectly alternating signs maximize runs (z > 0); " +
    "clumped halves minimize them (z < 0); counts are exact") {
    // alternating 10/30 around mean 20: 10 days → n_up=5, n_down=5, R=10
    // E[R] = 1 + 2·25/10 = 6, z > 0
    val alt = (1 to 10).map(i =>
      ("alt", f"2024-01-$i%02d", if (i % 2 == 0) 30L else 10L))
    // clumped: 5 low days then 5 high days → R = 2, z < 0
    val clump = (1 to 10).map(i =>
      ("clump", f"2024-01-$i%02d", if (i <= 5) 10L else 30L))
    val out = Runs.runsTest(dailyDec(alt ++ clump), "g", "d", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out("alt") ==
      ((5L, 5L, 10L, 6.0, out("alt")._5)) && out("alt")._5 > 0)
    assert(out("clump")._3 == 2L && out("clump")._4 == 6.0)
    assert(out("clump")._5 < 0)
    // symmetric fixtures: |z| identical (R=10 vs R=2 are mirror distances)
    assert(approx(out("alt")._5, -out("clump")._5, 1e-9))
  }

  test("runsTest: days exactly at the mean are dropped from the sequence") {
    // 20 is exactly the mean of {10, 20, 30} — the 20-day must not break
    // the low/high run structure: signs are -,+ → 2 runs of n1=n2=1
    val rows = Seq(("g", "2024-01-01", 10L), ("g", "2024-01-02", 20L),
      ("g", "2024-01-03", 30L))
    val out = Runs.runsTest(dailyDec(rows), "g", "d", "v").collect().head
    assert(out.getLong(1) == 1L && out.getLong(2) == 1L &&
      out.getLong(3) == 2L)
    assert(out.getDouble(4) == 2.0) // E[R] = 1 + 2·1·1/2 = 2
  }
}
