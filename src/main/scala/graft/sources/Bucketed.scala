package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing: pre-shuffle once at write time so every later join
  * or aggregation on the bucket key runs with ZERO exchange.
  *
  * At 100 TB the dominant cost of a fact-fact join (e.g. interactions ⋈
  * interactions, documents ⋈ dup-pairs) is the shuffle of both sides. Writing
  * both tables `bucketBy(n, key)` with sorted buckets makes Spark's
  * `FileSourceScanExec` report `HashPartitioning(key, n)` — `EnsureRequirements`
  * then inserts no exchange, and the sort-merge join reads co-located buckets
  * directly. The one-time write shuffle is amortized over every downstream
  * query; this is the batch analog of the persisted-IVF partition-pruned probe
  * (`SimSearch.ivfWriteIndex`).
  *
  * Bucketed tables need the session catalog (`saveAsTable` — bucket metadata
  * lives in the metastore, not the parquet footer), so callers pass a table
  * name, not a path.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-key bucketed tables — plans with no shuffle exchange when
    * both were written with the same bucket count on the join key.
    */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
                       rightTable: String, key: String,
                       joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
