package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, LeafExecNode}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

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
  * Cost (explicit, not free): reading the split count forces ONE physical
  * planning pass of the input plan — milliseconds for the scan-shaped
  * inputs this helper targets, and no job runs. The count is read from the
  * leaf file scans' own split RDDs (`sparkPlan`, pre-AQE), which is the
  * same arithmetic the executed query uses: AQE re-plans exchanges, it
  * never re-splits a file scan, so for a scan(+scan-local filter) input the
  * static and final counts coincide. Plans whose leaves are not file scans
  * fall back to `df.rdd.getNumPartitions` — a full RDD-DAG construction,
  * acceptable only because such inputs are small by contract here.
  *
  * The repartition is round-robin over full rows, costing one shuffle of
  * the small input — by construction less than the kernel work it unlocks.
  */
object ScanFanout {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val leaves = df.queryExecution.sparkPlan.collectLeaves()
    val scanParts = leaves.collect {
      case f: FileSourceScanExec => f.inputRDDs().map(_.getNumPartitions).sum
      case b: BatchScanExec      => b.inputRDDs().map(_.getNumPartitions).sum
    }
    // The static-split shortcut only describes the documented shape — ONE
    // file scan with scan-local ops above it and NO exchange. For
    // multi-leaf plans (join/union of scans) the SUM of leaf splits
    // overstates the plan's real output parallelism (the post-shuffle
    // partitioning governs), which could skip the repartition this helper
    // exists to add; and any exchange above a single scan (an explicit
    // repartition) decouples the output from the scan's split count in the
    // other direction. Both fall back to the materialized RDD's own count.
    val hasExchange = df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    val parts =
      if (leaves.length == 1 && scanParts.length == 1 && !hasExchange)
        scanParts.head
      else df.rdd.getNumPartitions
    if (parts < target) df.repartition(target) else df
  }
}
