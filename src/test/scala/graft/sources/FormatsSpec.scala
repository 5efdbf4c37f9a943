package graft.sources

import graft.SparkTestBase

class FormatsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String) =
    graft.Scratch.register(
    java.nio.file.Files.createTempDirectory(prefix).toString)

  private val rows = Seq(
    (1L, "alpha", "2024-01-31"),
    (2L, "beta|with|pipes", "2024-02-29"),
    (3L, "gamma, with commas and \"quotes\"", "2024-03-15"))

  test("ORC round-trip preserves schema and content exactly") {
    val df = rows.toDF("id", "name", "day")
    val dir = tmp("graft_orc_spec")
    try {
      val rt = Formats.orcRoundtrip(df, dir)
      // readers widen everything to nullable; names and types must hold
      assert(rt.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(rt.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2))).toSet == rows.toSet)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("CSV round-trip with explicit schema survives delimiters and quotes") {
    val df = rows.toDF("id", "name", "day")
    val dir = tmp("graft_csv_spec")
    try {
      val rt = Formats.csvRoundtrip(df, dir)
      assert(rt.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(rt.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2))).toSet == rows.toSet)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
