package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recommendation-list evaluation metrics — the natural extension of the
  * reference library's metric family (coverage/novelty/personalization measure
  * the catalog and diversity side; these measure ACCURACY against held-out
  * interactions). All set-based: inputs are (user, item) interaction frames,
  * recommendation order derived deterministically where rank matters.
  *
  * Scale shape: distinct → user-keyed aggregates and joins only; no windows
  * over global order; the corpus roll-up is a 1-row aggregate. Reciprocal
  * ranks sum through DECIMAL accumulators (order-independent).
  */
object RankingMetrics {

  /** Per-user precision/recall of the recommended set vs the actuals set.
    * Output: (user, n_recs, n_actual, n_hit, precision, recall) — one row per
    * user present in EITHER side (absent side counts 0; precision/recall null
    * when the denominator is 0, matching SQL semantics).
    */
  def precisionRecall(recs: DataFrame, actuals: DataFrame,
                      userCol: String, itemCol: String): DataFrame = {
    val r = recs.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val nr = r.groupBy(col("user")).agg(count(lit(1)).as("n_recs"))
    val na = a.groupBy(col("user")).agg(count(lit(1)).as("n_actual"))
    val hits = r.join(a, Seq("user", "item"))
      .groupBy(col("user")).agg(count(lit(1)).as("n_hit"))
    nr.join(na, Seq("user"), "full_outer")
      .join(hits, Seq("user"), "left")
      .select(col("user"),
        coalesce(col("n_recs"), lit(0L)).as("n_recs"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("precision",
        round(col("n_hit").cast("double") / expr("nullif(n_recs, 0)"), 6))
      .withColumn("recall",
        round(col("n_hit").cast("double") / expr("nullif(n_actual, 0)"), 6))
  }

  /** NDCG@k with binary relevance: each user's recommendations ranked by
    * (frequency desc, item), gain `1/log2(1+rank)` for ranks ≤ k that hit the
    * actuals; ideal DCG assumes the first `min(k, n_actual)` slots all hit.
    * Output per user WITH actuals: (user, n_actual, dcg, idcg, ndcg).
    *
    * Portability: `1/log2(1+r)` is computed as `ln2 / ln(1+r)` with an
    * embedded ln2 literal (both engines parse the same double), terms sum as
    * DECIMAL(18,8) — the [[meanReciprocalRank]] discipline.
    */
  def ndcgAtK(recs: DataFrame, actuals: DataFrame,
              userCol: String, itemCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ln2 = 0.6931471805599453
    val rc = recs.select(col(userCol).as("user"), col(itemCol).as("item"))
      .groupBy(col("user"), col("item")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user")).orderBy(col("n").desc, col("item"))
    val ranked = rc.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val dcg = ranked.join(a, Seq("user", "item"))
      .select(col("user"),
        (lit(ln2) / log(col("rnk") + 1)).cast("decimal(18,8)").as("g"))
      .groupBy(col("user")).agg(sum(col("g")).as("dcg"))
    val na = a.groupBy(col("user")).agg(count(lit(1)).as("n_actual"))
    val idcg = na
      .select(col("user"), col("n_actual"),
        explode(sequence(lit(1L), least(lit(k.toLong), col("n_actual")))).as("i"))
      .select(col("user"), col("n_actual"),
        (lit(ln2) / log(col("i") + 1)).cast("decimal(18,8)").as("g"))
      .groupBy(col("user"), col("n_actual")).agg(sum(col("g")).as("idcg"))
    idcg.join(dcg, Seq("user"), "left")
      .select(col("user"), col("n_actual"),
        round(coalesce(col("dcg"), lit(0)).cast("double"), 6).as("dcg"),
        round(col("idcg").cast("double"), 6).as("idcg"),
        round(coalesce(col("dcg"), lit(0)).cast("double") /
          col("idcg").cast("double"), 6).as("ndcg"))
  }

  /** Mean reciprocal rank: each user's recommendations are ranked by
    * (frequency desc, item) — a deterministic, popularity-within-user order —
    * and the user contributes 1/rank of their first actual hit (0 if none).
    * Output: 1 row (n_users, n_users_hit, mrr), averaging over every user
    * WITH recommendations.
    */
  def meanReciprocalRank(recs: DataFrame, actuals: DataFrame,
                         userCol: String, itemCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rc = recs.select(col(userCol).as("user"), col(itemCol).as("item"))
      .groupBy(col("user"), col("item")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user")).orderBy(col("n").desc, col("item"))
    val ranked = rc.withColumn("rnk", row_number().over(w).cast("long"))
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val firstHit = ranked.join(a, Seq("user", "item"))
      .groupBy(col("user")).agg(min(col("rnk")).as("first_hit"))
    val users = rc.select(col("user")).distinct()
    users.join(firstHit, Seq("user"), "left")
      .agg(count(lit(1)).as("n_users"),
        count(col("first_hit")).as("n_users_hit"),
        round(sum(coalesce((lit(1.0) / col("first_hit")).cast("decimal(18,8)"),
            lit(0).cast("decimal(18,8)")))
          .cast("double") / count(lit(1)), 6).as("mrr"))
  }
}
