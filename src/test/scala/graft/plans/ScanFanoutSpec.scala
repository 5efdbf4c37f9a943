package graft.plans

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[ScanFanout.fanOut]]: the static-split shortcut must only apply to the
  * documented single-file-scan shape; multi-leaf plans (joins of scans) must
  * use the materialized partition count so a narrow post-shuffle result
  * still gets its repartition.
  */
class ScanFanoutSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir = {
    val d = graft.Scratch.register(Files.createTempDirectory("fanout").toString)
    (1L to 100L).map(i => (i, s"d$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/t1")
    (1L to 100L).map(i => (i, i % 7)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/t2")
    d
  }

  test("single one-row-group scan fans out to default parallelism") {
    val df = spark.read.parquet(s"$dir/t1")
    val out = ScanFanout.fanOut(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.count() == 100)
  }

  test("an already-wide input is returned untouched") {
    val df = spark.read.parquet(s"$dir/t1")
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val out = ScanFanout.fanOut(df)
    // no narrowing repartition was inserted
    assert(out.rdd.getNumPartitions == df.rdd.getNumPartitions)
  }

  test("multi-leaf join uses the real post-shuffle parallelism, not the " +
      "sum of leaf splits") {
    // join of two single-split scans then coalesce(1): leaf-split SUM says 2,
    // the actual output parallelism is 1 — the helper must still fan out
    val j = spark.read.parquet(s"$dir/t1")
      .join(spark.read.parquet(s"$dir/t2"), "id")
      .coalesce(1)
    assert(j.rdd.getNumPartitions == 1)
    val out = ScanFanout.fanOut(j)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      "narrow multi-leaf plan must be repartitioned")
    assert(out.count() == 100)
  }
}
