package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end replay harness for the stateful streaming twins: drive a
  * DETERMINISTIC timestamped event stream through a streaming operator via
  * the deployment sink shape (`foreachBatch` appending into one table) and
  * hand back the final accumulated table. One `addData` +
  * `processAllAvailable` per micro-batch makes watermark advancement — and
  * therefore event-time TTL eviction — deterministic, so a spec can pin the
  * op's end-to-end behavior (which pairs surface, which evictions happen)
  * against the batch twin run on the same data, rather than only unit-level
  * state transitions.
  */
object StreamReplay {

  /** Replay `batches` in order through `build`, appending every
    * micro-batch's output to one parquet table; returns the table re-read.
    * The parquet round-trip is deliberate: it exercises the real
    * `foreachBatch` sink path (schema, append atomicity) instead of the
    * memory sink's shortcut.
    */
  def replay[I <: Product : Encoder](spark: SparkSession,
                                     batches: Seq[Seq[I]],
                                     build: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[I]
    val dir = java.nio.file.Files.createTempDirectory("graft_replay")
    graft.Scratch.register(dir.toString)
    val outDir = dir.resolve("out").toString
    val ckDir = dir.resolve("ck").toString
    val query = build(input.toDF()).writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .option("checkpointLocation", ckDir)
      .start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
    } finally query.stop()
    spark.read.parquet(outDir)
  }
}
