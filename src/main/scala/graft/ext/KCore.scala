package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction: the maximal subgraph in which every node has degree ≥ k
  * — the standard graph-denoising cut before community detection or
  * representation learning (1-degree chains and isolated dyads are noise for
  * both).
  *
  * Iterative peeling: drop all nodes with degree < k, recompute degrees on
  * the induced subgraph, repeat to fixpoint. Each round is one aggregate +
  * two semi-joins on the shrinking edge set; the edge frame is
  * localCheckpoint'd per round so round N+1 reads round N's materialized
  * output instead of replaying the whole lineage (the [[Dedup.dupClusters]]
  * discipline). Rounds are O(peeling depth) — bounded by the degeneracy
  * ordering, in practice tens — and the frame shrinks monotonically, so later
  * rounds get cheaper, not deeper.
  */
object KCore {

  /** Nodes of the k-core with their core-subgraph degrees.
    * Output: (node, deg) for every node in the k-core; empty when the graph
    * has no k-core. Input edges are normalized (dedup, self-loops dropped,
    * orientation irrelevant).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxIter: Int = 100): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      val pruned = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
      // one O(1) scalar per round off the already-materialized frames
      converged = pruned.count() == e.count()
      e = pruned
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore did not converge in $maxIter rounds — raise maxIter")
    e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
  }
}
