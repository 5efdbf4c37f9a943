package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Columnar/text format interop beyond parquet: ORC and CSV write→read
  * round-trips. The engine's tables live in parquet; a lakehouse neighbor
  * often demands ORC (Hive ecosystems) or CSV (exports), and the property
  * that matters is LOSSLESSNESS — the round-tripped frame must be
  * content-identical, which the digest queries prove end-to-end
  * ([[graft.ext.Integrity.groupDigest]] over the round-trip vs the oracle's
  * digest of the parquet original).
  *
  * Scale shape: both writers stream partition-parallel; the CSV reader is
  * given the ORIGINAL schema explicitly (schema inference is a full extra
  * pass and type-lossy — the classic CSV trap), so reads stay single-pass
  * with pushed-down pruning where the format allows (ORC carries min/max
  * strides like parquet; CSV prunes nothing, which is why it is an export
  * format, not a table format).
  */
object Formats {

  /** Write `df` as ORC under `path` and read it back. */
  def orcRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).orc(path)
    df.sparkSession.read.orc(path)
  }

  /** Write `df` as JSON Lines under `path` and read it back with the
    * ORIGINAL schema (never inferred — inference is an extra full pass and
    * widens integer types). Same caller contract as [[csvRoundtrip]]:
    * exact-text column types only; JSONL is the interchange format every
    * LLM-corpus pipeline speaks, so losslessness here is the property that
    * lets this engine sit between a crawler and a trainer.
    */
  def jsonlRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** Write `df` as headered CSV under `path` and read it back with the
    * ORIGINAL schema (never inferred). Callers must pass frames whose
    * column types have exact text forms (integers, strings, dates) — a raw
    * double column would round-trip through engine-specific formatting.
    */
  def csvRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    df.sparkSession.read.schema(df.schema)
      .option("header", "true").csv(path)
  }
}
