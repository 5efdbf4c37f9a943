package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Exercises the check-rule logic directly on analyzed plans (the
  * `injectCheckRule` wiring in [[graft.GraftExtensions]] is a one-line pass
  * through to [[ScaleGuard.check]]; a second session with its own extensions
  * can't coexist with the suite-shared one in one JVM).
  */
class ScaleGuardSpec extends SparkTestBase {
  import spark.implicits._

  private def check(df: DataFrame): Unit =
    ScaleGuard.check(spark)(df.queryExecution.analyzed)

  // a parquet-backed relation, not a local Seq or spark.range: LocalRelation
  // (literal data) AND a literal Range both carry their cardinality in the
  // plan and are correctly classified bounded — only a real scan is
  // statically unbounded, which is what the reject tests need
  private lazy val t: DataFrame = {
    val dir = graft.Scratch.register(
      java.nio.file.Files.createTempDirectory("graft_sg").toString)
    spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def withFail(body: => Unit): Unit = {
    spark.conf.set(ScaleGuard.FailConf, "true")
    try body finally spark.conf.set(ScaleGuard.FailConf, "false")
  }

  test("an unpartitioned window over an unbounded child is rejected when " +
    "the fail conf is on, and only warned otherwise") {
    import org.apache.spark.sql.expressions.Window
    val bad = t.withColumn("rn",
      row_number().over(Window.orderBy(col("id"))))
    withFail {
      val e = intercept[IllegalStateException] { check(bad) }
      assert(e.getMessage.contains("scale guard"))
    }
    check(bad) // default: warn-only, no throw
  }

  test("partitioned windows and bounded children pass under fail mode") {
    import org.apache.spark.sql.expressions.Window
    withFail {
      check(t.withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("id")))))
      // the q_bm25 shape: global rank AFTER a limit
      check(t.orderBy(col("id")).limit(5).withColumn("rn",
        row_number().over(Window.orderBy(col("id")))))
      // window over a 1-row aggregate
      check(t.agg(sum(col("id")).as("s")).withColumn("rn",
        row_number().over(Window.orderBy(col("s")))))
      // bounded ⋈ bounded stays bounded
      check(t.limit(3).crossJoin(
          t.limit(2).select(col("id").as("id2"), col("k").as("k2")))
        .withColumn("rn", row_number().over(Window.orderBy(col("id")))))
    }
  }

  test("an unbounded side of a join un-bounds the window child") {
    import org.apache.spark.sql.expressions.Window
    withFail {
      val half = t.limit(3).crossJoin(t.select(col("id").as("id2")))
      intercept[IllegalStateException] {
        check(half.withColumn("rn",
          row_number().over(Window.orderBy(col("id")))))
      }
    }
  }

  test("cartesian-shaped joins over two scans are rejected; bounded, " +
      "hinted and waived sides pass") {
    withFail {
      val t2 = t.select(col("id").as("id2"), col("k").as("k2"))
      // raw scan × raw scan, no condition: the 100 TB plan-killer
      intercept[IllegalStateException] { check(t.crossJoin(t2)) }
      // theta-only condition still plans as BNLJ: same verdict
      intercept[IllegalStateException] {
        check(t.join(t2, col("id") < col("id2")))
      }
      // an equality LOCAL to one side does not key the join
      intercept[IllegalStateException] {
        check(t.join(t2, col("id2") === col("k2") && col("id") < col("id2")))
      }
      // a real equi key between the sides: fine
      check(t.join(t2, col("id") === col("id2")))
      // one side bounded by a limit or a global aggregate: fine
      check(t.limit(5).crossJoin(t2))
      check(t.crossJoin(t2.agg(sum(col("id2")).as("s"))))
      // explicit broadcast hint = the author's size declaration: fine
      check(t.crossJoin(broadcast(t2.filter(col("id2") < 8))))
      // explicit waiver marker for documented all-pairs sites: fine
      check(t.crossJoin(ScaleGuard.allowCartesian(t2)))
      // ...but a waiver on an INNER join must not leak to an outer one
      val waivedInner = t.crossJoin(ScaleGuard.allowCartesian(t2))
      intercept[IllegalStateException] {
        check(waivedInner.crossJoin(
          t.select(col("id").as("id3"), col("k").as("k3"))))
      }
    }
  }

  test("a window over a GROUPED aggregate passes under fail mode (the " +
    "library's post-aggregation idiom), and explode un-bounds a limit") {
    import org.apache.spark.sql.expressions.Window
    withFail {
      // the Mixing.unimaxAllocation / tier-CDF shape: groupBy then a global
      // cumulative window over the per-group rows
      check(t.groupBy(col("k")).agg(sum(col("id")).as("s"))
        .withColumn("cum", sum(col("s")).over(Window.orderBy(col("k")))))
      // Generate multiplies rows: explode over a limit is NOT bounded
      val exploded = t.limit(3)
        .select(explode(sequence(lit(1), col("id") + 1)).as("e"))
      intercept[IllegalStateException] {
        check(exploded.withColumn("rn",
          row_number().over(Window.orderBy(col("e")))))
      }
    }
  }
}
