package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External clustering evaluation against gold labels — the metrics that
  * close the loop on [[Clustering]]: given (item, cluster) and (item, gold
  * class), how well does the found partition recover the classes? Both
  * metrics here are the standard ones from the clustering-evaluation
  * literature and both reduce to the cluster×class contingency table, so
  * the corpus-sized work is ONE groupBy; everything after runs on
  * |clusters|×|classes| rows.
  *
  * Exactness: all contingency inputs are integer counts; per-cell terms are
  * single fixed-order double divisions pooled in DECIMAL(28,12); pair
  * counts x·(x−1) are built in DECIMAL (doubled form — halving happens once
  * at the double stage) so nothing overflows int64 even at 1e9-item
  * clusters.
  */
object ClusterEval {

  /** BCubed precision/recall/F1 (Bagga & Baldwin 1998; the Amigó et al.
    * 2009 survey's recommended cluster metric): item-averaged
    * `P = (1/n)·Σ_cells n_ij²/a_i`, `R = (1/n)·Σ_cells n_ij²/b_j`,
    * `F = 2PR/(P+R)` — precision punishes mixed clusters, recall punishes
    * split classes, and unlike pair-counting metrics both degrade
    * gracefully on singleton-heavy partitions.
    *
    * Output: 1 row (n, n_clusters, n_classes, bcubed_p, bcubed_r, bcubed_f).
    */
  def bcubed(assign: DataFrame, idCol: String, clusterCol: String,
             gold: DataFrame, goldIdCol: String, classCol: String): DataFrame = {
    val cells = assign.select(col(idCol).as("__id"), col(clusterCol).as("c"))
      .join(gold.select(col(goldIdCol).as("__id"), col(classCol).as("g")),
        Seq("__id"))
      .groupBy(col("c"), col("g")).agg(count(lit(1)).as("nij"))
    val ai = cells.groupBy(col("c")).agg(sum(col("nij")).as("ai"))
    val bj = cells.groupBy(col("g")).agg(sum(col("nij")).as("bj"))
    val tot = cells.agg(sum(col("nij")).as("n"),
      countDistinct(col("c")).as("n_clusters"),
      countDistinct(col("g")).as("n_classes"))
    val nij2 = (col("nij").cast("decimal(19,0)") *
      col("nij").cast("decimal(19,0)")).cast("double")
    val terms = cells.join(ai, Seq("c")).join(bj, Seq("g"))
      .select((nij2 / col("ai").cast("double")).cast("decimal(28,12)").as("tp"),
        (nij2 / col("bj").cast("double")).cast("decimal(28,12)").as("tr"))
      .agg(sum(col("tp")).as("sp"), sum(col("tr")).as("sr"))
    val p = col("sp").cast("double") / col("n").cast("double")
    val r = col("sr").cast("double") / col("n").cast("double")
    terms.crossJoin(broadcast(tot))
      .select(col("n"), col("n_clusters"), col("n_classes"),
        p.as("bcubed_p"), r.as("bcubed_r"),
        (((lit(2.0) * p) * r) / (p + r)).as("bcubed_f"))
  }

  /** Adjusted Rand index (Hubert & Arabie 1985): the pair-counting
    * agreement between partition and classes, corrected for chance —
    * ARI = (Index − E[Index]) / (Max − E[Index]) over C(·,2) pair counts.
    * 1 = identical partitions, ≈0 = random assignment, <0 = worse than
    * chance. Pair counts are accumulated DOUBLED (x·(x−1), exact DECIMAL)
    * and halved once in the final double formula.
    *
    * Output: 1 row (n, sum_pairs_cells, expected_index, max_index, ari).
    */
  def adjustedRandIndex(assign: DataFrame, idCol: String, clusterCol: String,
                        gold: DataFrame, goldIdCol: String,
                        classCol: String): DataFrame = {
    val cells = assign.select(col(idCol).as("__id"), col(clusterCol).as("c"))
      .join(gold.select(col(goldIdCol).as("__id"), col(classCol).as("g")),
        Seq("__id"))
      .groupBy(col("c"), col("g")).agg(count(lit(1)).as("nij"))
    def comb2x2(c: org.apache.spark.sql.Column) =
      c.cast("decimal(19,0)") * (c - 1).cast("decimal(19,0)")
    val sidx2 = cells.agg(sum(comb2x2(col("nij"))).as("sidx2"),
      sum(col("nij")).as("n"))
    val sa2 = cells.groupBy(col("c")).agg(sum(col("nij")).as("ai"))
      .agg(sum(comb2x2(col("ai"))).as("sa2"))
    val sb2 = cells.groupBy(col("g")).agg(sum(col("nij")).as("bj"))
      .agg(sum(comb2x2(col("bj"))).as("sb2"))
    val j = sidx2.crossJoin(broadcast(sa2)).crossJoin(broadcast(sb2))
    val sidx = col("sidx2").cast("double") / 2.0
    val sa = col("sa2").cast("double") / 2.0
    val sb = col("sb2").cast("double") / 2.0
    val cn = (comb2x2(col("n"))).cast("double") / 2.0
    val expected = (sa * sb) / cn
    val maxi = (sa + sb) / 2.0
    j.select(col("n"), sidx.as("sum_pairs_cells"), expected.as("expected_index"),
      maxi.as("max_index"), ((sidx - expected) / (maxi - expected)).as("ari"))
  }
}
