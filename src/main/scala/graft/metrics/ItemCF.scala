package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item collaborative-filtering neighborhoods over binary interactions —
  * the item-side transpose of P6 personalization's user-user cosine
  * (/root/reference/recmetrics_pyspark/recmetrics_pyspark.py:287-413 computes
  * user rows; serving "users who bought X also bought Y" needs item rows).
  *
  * With binary (user, item) vectors, cosine(i,j) reduces to
  * `co(i,j) / sqrt(n_i · n_j)` where co = #users holding both and n_i = #users
  * holding i — so the whole computation is one self-join on user plus keyed
  * aggregates; no matrix library, no pivot.
  *
  * Scale shape: the self-join's cost is Σ_user basket², so whale users (bots,
  * shared accounts) dominate at 100 TB. `maxBasket` drops users above a basket
  * cap BEFORE the join — the standard power-user cut in item-CF (their
  * co-occurrence signal is near-uniform noise anyway). `minSupport` prunes
  * long-tail items before the join, shrinking both sides. Top-k per item runs
  * as a user-keyed WindowGroupLimit, never a global sort.
  */
object ItemCF {

  /** Top-k cosine neighbors per item.
    * Output: (item_id, neighbor_id, n_item, n_neighbor, n_both, cosine, rnk)
    * for ranks ≤ k, ties broken by neighbor id.
    */
  def itemNeighbors(interactions: DataFrame, userCol: String, itemCol: String,
                    k: Int = 3, minSupport: Long = 5,
                    maxBasket: Long = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // b0 feeds three differently-keyed branches (basket sizes, item support,
    // the join input) — materialize the upstream interactions+distinct once
    // instead of letting AQE re-run it per branch (35 scans observed).
    val b0 = interactions
      .select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
      .localCheckpoint(eager = true)
    val keptUsers = b0.groupBy(col("user")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasket).select(col("user"))
    val ni = b0.join(keptUsers, Seq("user"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minSupport)
    val b = b0.join(keptUsers, Seq("user"))
      .join(ni, Seq("item"))
      .select(col("user"), col("item"), col("n_users"))
    // one ordered self-join builds each unordered pair once; both directions
    // are emitted afterwards so every item ranks its own neighbor list
    val co = b.as("x").join(b.as("y"),
        col("x.user") === col("y.user") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("i"), col("y.item").as("j"),
        col("x.n_users").as("ni"), col("y.n_users").as("nj"))
      .agg(count(lit(1)).as("n_both"))
    // both directions from ONE generator, not a UNION of two projections — a
    // union's branches each re-specialize (and re-run) the whole co-occurrence
    // aggregate upstream; explode(array(struct…)) keeps a single subtree
    val directed = co.select(explode(array(
        struct(col("i").as("item_id"), col("j").as("neighbor_id"),
          col("ni").as("n_item"), col("nj").as("n_neighbor"), col("n_both")),
        struct(col("j").as("item_id"), col("i").as("neighbor_id"),
          col("nj").as("n_item"), col("ni").as("n_neighbor"), col("n_both"))))
        .as("e"))
      .select(col("e.*"))
      .withColumn("cosine",
        col("n_both").cast("double") / sqrt(col("n_item") * col("n_neighbor")))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    directed.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .withColumn("cosine", round(col("cosine"), 6))
  }
}
