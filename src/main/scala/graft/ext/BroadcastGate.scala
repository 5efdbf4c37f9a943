package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared row-count gate for EXPLICIT broadcast hints on checkpoint-fed
  * join sides (r17). Why hints at all: a localCheckpoint's LogicalRDD
  * carries the ORIGINAL subtree's size estimate — for the iterative
  * operators that is an edge-join-sized guess far over the 10 MB
  * autoBroadcastJoinThreshold — so the planner sort-merges and re-shuffles
  * (or re-sorts) the BIG side of every join against a checkpointed
  * node-sized table, every round (measured: q_mis shuffled 41 MB → 1.8 MB
  * once hinted, JobProbe r17). AQE cannot rescue these joins either: its
  * strategy switch needs a materialized EXCHANGE stage on the build side,
  * and checkpoint reads have none.
  *
  * The gate is decided from a REAL row count over already-materialized
  * checkpoint blocks (one cheap job — the Hits partitioned-copy gate
  * pattern), never from estimates. 4M rows of slim (≤ ~40 B) rows is a
  * 40-160 MB hash relation — comfortably inside executor budgets and far
  * under the 8 GB / 512M-row broadcast hard cap; above the gate callers
  * keep their shuffled/partitioned-layout paths, which is the correct
  * plan at that scale anyway.
  */
object BroadcastGate {

  val MaxRows: Long = 4000000L

  /** `broadcast` when `rows` is under the gate, identity otherwise. */
  def hint(rows: Long): DataFrame => DataFrame =
    if (rows <= MaxRows) broadcast else identity
}
