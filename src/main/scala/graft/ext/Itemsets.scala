package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Apriori frequent-itemset mining to level 3 (Agrawal & Srikant,
  * VLDB'94), with the support threshold expressed as a RATE of the basket
  * count so the same query is meaningful at every scale factor.
  *
  * Scale shape: the level-2 candidate join is basket-keyed (pairs are only
  * generated inside a basket), and level 3 extends PRUNED pairs — the
  * Apriori property (every subset of a frequent set is frequent) is applied
  * as broadcast-able semi-joins on the three sub-pairs before any counting,
  * so the triple generation never sees an item that already failed level 2.
  * All support checks are integer cross-multiplications
  * (`n · denom ≥ total · num`), no float thresholds.
  */
object Itemsets {

  /** Frequent triples over (basket, item) rows with support ≥
    * `supNum`/`supDenom` of the distinct-basket count. Output: (item_a,
    * item_b, item_c, support, lift) where lift = n_abc·N² / (n_a·n_b·n_c)
    * — the independence-ratio readout at level 3, one fixed-order double
    * formula. Items are returned in ascending order within each triple.
    */
  def frequentTriples(baskets: DataFrame, basketCol: String, itemCol: String,
                      supNum: Long, supDenom: Long): DataFrame = {
    require(supNum >= 1 && supDenom >= supNum,
      s"support rate must be in (0, 1]: $supNum/$supDenom")
    val b = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
      // every level reads it: the basket self-joins and the three support
      // semi-joins would otherwise each re-run the upstream scan+distinct
      .localCheckpoint(eager = true)
    val total = b.select(col("bk")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    // level 1: per-item support (kept for the lift denominator)
    val s1 = b.groupBy(col("it")).agg(count(lit(1)).as("n1"))
      .crossJoin(broadcast(total))
      .filter(col("n1") * supDenom >= col("n_baskets") * supNum)
      .localCheckpoint(eager = true)
    // level 2: in-basket pairs of frequent items, then the support cut
    val bf = b.join(s1.select(col("it")), Seq("it"), "left_semi")
    val s2 = bf.select(col("bk"), col("it").as("ia"))
      .join(bf.select(col("bk"), col("it").as("ib")), "bk")
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n2"))
      .crossJoin(broadcast(total))
      .filter(col("n2") * supDenom >= col("n_baskets") * supNum)
      .select(col("ia"), col("ib"))
      .localCheckpoint(eager = true)
    // level 3: extend each frequent pair inside its baskets, prune the two
    // new sub-pairs (Apriori), then count
    val pairInBasket = bf.select(col("bk"), col("it").as("ia"))
      .join(bf.select(col("bk"), col("it").as("ib")), "bk")
      .filter(col("ia") < col("ib"))
      .join(s2, Seq("ia", "ib"), "left_semi")
    val triples = pairInBasket
      .join(bf.select(col("bk"), col("it").as("ic")), "bk")
      .filter(col("ib") < col("ic"))
      .join(s2.select(col("ia"), col("ib").as("ic")), Seq("ia", "ic"),
        "left_semi")
      .join(s2.select(col("ia").as("ib"), col("ib").as("ic")),
        Seq("ib", "ic"), "left_semi")
      .groupBy(col("ia"), col("ib"), col("ic"))
      .agg(count(lit(1)).as("n3"))
      .crossJoin(broadcast(total))
      .filter(col("n3") * supDenom >= col("n_baskets") * supNum)
    triples
      .join(s1.select(col("it").as("ia"), col("n1").as("na")), "ia")
      .join(s1.select(col("it").as("ib"), col("n1").as("nb")), "ib")
      .join(s1.select(col("it").as("ic"), col("n1").as("nc")), "ic")
      .select(col("ia").as("item_a"), col("ib").as("item_b"),
        col("ic").as("item_c"), col("n3").as("support"),
        (col("n3").cast("double") * col("n_baskets") * col("n_baskets") /
          (col("na").cast("double") * col("nb") * col("nc"))).as("lift"))
  }
}
