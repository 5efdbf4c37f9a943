package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Line-delimited JSON corpus reader — the wire format most raw training
  * corpora actually arrive in (one document object per line). Parquet is the
  * engine's working format ([[Partitioned]]/[[Bucketed]]); this is the
  * ingest seam in front of it.
  *
  * Contract:
  *  - an EXPLICIT schema, always — schema inference reads the whole corpus
  *    twice and silently unions drifting shapes; at 100 TB both are outages.
  *    With a user schema the JSON scan is also column-pruned: only the
  *    projected fields are parsed (Jackson skips the rest), so a 2-field
  *    query does not pay for a 50-field document.
  *  - corrupt lines are CAPTURED, not dropped or fatal: PERMISSIVE mode
  *    with an explicit `_corrupt_record` column; [[readClean]] splits the
  *    stream into (clean, quarantine) so a pipeline can land both.
  *  - line-delimited means the format splits on newlines — Spark
  *    parallelizes by file block like any text source, no whole-file parse.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** The engine's canonical document-corpus schema (TESTDATA.md shape). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read with the corrupt-record capture column appended. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** (clean rows without the capture column, quarantined raw lines).
    * Spark populates ONLY `_corrupt_record` for unparseable lines, so the
    * split predicate is its null-ness. The input is cached for the two
    * consumers — otherwise each side re-parses the corpus.
    */
  def readClean(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    val raw = read(spark, path, schema).cache()
    val clean = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantine)
  }
}
