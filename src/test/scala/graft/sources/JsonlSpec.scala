package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

class JsonlSpec extends SparkTestBase {

  private def writeCorpus(lines: Seq[String]): String = {
    val dir = java.nio.file.Paths.get(
      graft.Scratch.register(Files.createTempDirectory("jsonl_spec").toString))
    Files.writeString(dir.resolve("part-0.jsonl"), lines.mkString("\n"))
    dir.toString
  }

  test("readClean splits parseable documents from quarantined raw lines " +
    "without dropping either") {
    val path = writeCorpus(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "a", "n_chars": 11}""",
      """this is not json at all""",
      """{"doc_id": 2, "text": "zwei", "lang": "de", "source": "b", "n_chars": 4}""",
      """{"doc_id": 3, "text": "truncated...""""))
    val (clean, quarantine) = Jsonl.readClean(spark, path,
      Jsonl.DocumentsSchema)
    val rows = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "hello world", 2L -> "zwei"))
    assert(!clean.columns.contains(Jsonl.CorruptCol))
    val bad = quarantine.collect().map(_.getString(0))
    assert(bad.length == 2)
    assert(bad.exists(_.contains("not json")))
  }

  test("missing fields are null, not corrupt — schema drift degrades " +
    "gracefully") {
    val path = writeCorpus(Seq(
      """{"doc_id": 9, "text": "no source field"}"""))
    val (clean, quarantine) = Jsonl.readClean(spark, path,
      Jsonl.DocumentsSchema)
    val r = clean.collect().head
    assert(r.getLong(0) == 9L && r.isNullAt(3))
    assert(quarantine.count() == 0)
  }

  test("the JSON scan is column-pruned to the projected fields") {
    val path = writeCorpus(Seq(
      """{"doc_id": 1, "text": "x", "lang": "en", "source": "a", "n_chars": 1}"""))
    val df = Jsonl.read(spark, path, Jsonl.DocumentsSchema)
      .select("doc_id", "text")
    val scanned = df.queryExecution.executedPlan.toString
    // the FileScan's ReadSchema must not carry the unprojected columns
    assert(scanned.contains("ReadSchema"))
    assert(!scanned.contains("n_chars"), scanned.linesIterator
      .filter(_.contains("ReadSchema")).mkString("; "))
  }
}
