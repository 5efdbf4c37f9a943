package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007, made deterministic) —
  * community detection over product co-purchase / user-interaction graphs,
  * the cheap first pass before any modularity-style refinement.
  *
  * Each iteration every node adopts the label carrying the largest total
  * incident edge weight among its neighbours' CURRENT labels, ties broken by
  * the smallest label id (the determinism knob — classic LPA tie-breaks
  * randomly and is unreproducible). Isolated nodes keep their own label.
  * A FIXED iteration count (not convergence polling) keeps every run — and
  * the unrolled SQL oracle — bit-identical.
  *
  * Scale shape (100 TB): one shuffle per iteration — join labels to the edge
  * list on src (labels table is |V| rows, edge list |E|), then a
  * (dst, label)-keyed weight sum with map-side partial aggregation, then a
  * per-dst rank-1 window that compiles to WindowGroupLimit (top-1 per key,
  * partial-pushed). Weights are integral counts, so sums are exact and
  * order-independent. The edge list is reused every iteration —
  * localCheckpoint once up front.
  */
object Communities {

  /** `iters` rounds of deterministic sync LPA over an undirected weighted
    * edge list (srcCol, dstCol, weightCol). Returns (node, label).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iters: Int): DataFrame = {
    // symmetrize once; both directions carry the same weight
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).as("w"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst"),
        col(weightCol).as("w")))
      .localCheckpoint(eager = true)

    val nodes = sym.select(col("src").as("node")).distinct()
      .localCheckpoint(eager = true)
    var labels = nodes.select(col("node"), col("node").as("label"))

    val rank = Window.partitionBy(col("dst"))
      .orderBy(col("wsum").desc, col("lbl"))
    (1 to iters).foreach { _ =>
      val adopted = sym.join(labels, sym("src") === labels("node"))
        .groupBy(col("dst"), col("label").as("lbl"))
        .agg(sum(col("w")).as("wsum"))
        .withColumn("__rn", row_number().over(rank))
        .filter(col("__rn") === 1)
        .select(col("dst").as("node"), col("lbl").as("new_label"))
      labels = labels.join(adopted, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
    }
    labels
  }
}
