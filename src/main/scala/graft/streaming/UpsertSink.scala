package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once keyed upsert sink for Structured Streaming over plain
  * parquet — the lakehouse MERGE pattern without a table format:
  *
  *  - each micro-batch lands as `outDir/batch=<batchId>/` via `foreachBatch`,
  *    written with `overwrite` so a REPLAYED batch (restart after a crash
  *    between sink write and checkpoint commit) overwrites its own directory
  *    instead of duplicating rows — idempotence is per-batch-directory, the
  *    same contract a table format's transaction log provides;
  *  - readers resolve current state with [[graft.ext.Compaction.compactLatest]]
  *    over the batch partitions, versioned by (batchId, caller versions...) —
  *    latest-wins per key, tombstones honored.
  *
  * Scale shape: the write is micro-batch-sized and partition-pruned readers
  * can bound how much history they compact (periodic base compaction — fold
  * old batch dirs into one via the same compactLatest and drop them — keeps
  * the directory count flat; that job IS `compactLatest` run as a batch).
  */
object UpsertSink {

  /** `foreachBatch` handler: land the micro-batch idempotently. Use as
    * `.writeStream.foreachBatch(UpsertSink.writeBatch(dir) _)`.
    */
  def writeBatch(outDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")

  /** Current state: latest version per key across all landed batches.
    * `versionCols` order rows WITHIN a batch (pass a unique id last); the
    * batch id is always the leading version component.
    */
  def readCurrent(spark: SparkSession, outDir: String, keyCols: Seq[String],
                  versionCols: Seq[String],
                  tombstone: org.apache.spark.sql.Column = lit(false))
      : DataFrame =
    graft.ext.Compaction.compactLatest(
      spark.read.option("basePath", outDir).parquet(outDir),
      keyCols, "batch" +: versionCols, tombstone)
}
