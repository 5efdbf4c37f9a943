package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class PartitionedSpec extends SparkTestBase {
  import spark.implicits._

  test("partition filter prunes directories at the scan, not after") {
    val dir = graft.Scratch.register(
      Files.createTempDirectory("graft_part").toString) + "/docs"
    val df = (1 to 400).map(i => (i.toLong, s"src_${i % 8}", s"text $i"))
      .toDF("doc_id", "source", "text")
    Partitioned.writePartitioned(df, dir, Seq("source"))

    val read = Partitioned.readPartitioned(spark, dir)
      .filter(col("source") === "src_3")
    assert(read.count() == 50)

    val scan = read.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "filter on the partition column must become a PartitionFilter")
    // only the one matching directory's files are selected
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.size).sum == 1)
  }

  test("writer consolidates files per partition value") {
    val dir = graft.Scratch.register(
      Files.createTempDirectory("graft_part2").toString) + "/events"
    val df = (1 to 1000).map(i => (i.toLong, s"d${i % 4}")).toDF("id", "day")
    Partitioned.writePartitioned(df, dir, Seq("day"))
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap
    assert(files.keySet == Set("day=d0", "day=d1", "day=d2", "day=d3"))
    assert(files.values.forall(_ == 1), s"one file per partition dir: $files")
  }

  test("partitioned layout round-trips with partition column restored") {
    val dir = graft.Scratch.register(
      Files.createTempDirectory("graft_part3").toString) + "/events"
    val df = (1 to 1000).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "day")
    Partitioned.writePartitioned(df, dir, Seq("day"))
    val back = Partitioned.readPartitioned(spark, dir)
    assert(back.count() == 1000)
    // the directory-encoded column comes back queryable
    assert(back.where(col("day") === "d1").count() == 334)
  }
}
