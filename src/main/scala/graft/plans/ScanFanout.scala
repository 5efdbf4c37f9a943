package graft.plans

import org.apache.spark.sql.DataFrame

/** Fan a too-narrow scan out to the session's parallelism before a
  * compute-heavy scan-local kernel (winnowing, minhash, codecs).
  *
  * Why: parquet splits at ROW-GROUP granularity, so a small table written as
  * one row group plans as ONE partition no matter what
  * `spark.sql.files.maxPartitionBytes` says — and any expensive expression
  * sitting directly on that scan (md5 per character position, per-doc codec
  * loops) runs single-threaded while 31 cores idle. At production scale the
  * same table has thousands of row groups and this helper is an exact no-op;
  * it exists for the long tail of small dimension/side tables that real
  * pipelines also hit (a 500-doc eval set joined against a 100 TB corpus).
  *
  * The check reads only the plan's partition arithmetic (no job runs); the
  * repartition is round-robin over full rows, costing one shuffle of the
  * small input — by construction less than the kernel work it unlocks.
  */
object ScanFanout {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
