package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Novelty — mean self-information of recommendation lists.
  *
  * Reference: `novelty` (/root/reference/recmetrics_pyspark/recmetrics_pyspark.py:147-173).
  * Per item, popularity = its row count in sales; self-information
  * `log2 = -log2(pop / u)` where `u` defaults to the number of distinct users in sales
  * (:154-155). Recommendations LEFT-join the popularity table (:158), so items never
  * seen in sales contribute a null `log2`; per user msi = `sum(log2) / count(*)` where
  * the sum skips nulls but the count does not — the reference's exact (silently
  * deflating) null semantics, which we preserve bit-for-bit (SURVEY.md §2.4.2).
  *
  * The reference computes the per-user sum and count as two separate aggregates joined
  * back together (:160-162); that shape is an artifact, not a semantic — we fuse them
  * into one aggregate (SURVEY.md §2.3 "Aggregations").
  */
object Novelty {

  /** Per-user mean self-information. Output: (colUser, msi) — msi unrounded.
    *
    * When `u` is not given, the distinct-user count is a 1-row aggregate
    * broadcast-cross-joined into the pipeline (the reference runs it as an eager
    * separate action, `:154-155`) — the whole metric stays one Spark job.
    */
  def perUserMsi(dfSales: DataFrame, dfRecommendations: DataFrame,
                 u: Option[Long] = None,
                 colUser: String = "person", colItem: String = "product"): DataFrame = {
    val pop = dfSales.groupBy(col(colItem)).agg(count(lit(1)).as("pop_count"))
    val joined = dfRecommendations.join(pop, Seq(colItem), "left")
    val withU = u match {
      case Some(n) => joined.withColumn("__u", lit(n.toDouble))
      case None =>
        val uAgg = dfSales.agg(countDistinct(col(colUser)).cast("double").as("__u"))
        joined.crossJoin(broadcast(uAgg))
    }
    withU
      .withColumn("log2", -log(2.0, col("pop_count") / col("__u")))
      .groupBy(col(colUser))
      .agg((sum(col("log2")) / count(lit(1))).as("msi"))
  }

  /** Reference-shaped result: (mean over users, per-user msi ordered by user).
    * The mean is computed distributed (`avg`), not on the driver.
    */
  def novelty(dfSales: DataFrame, dfRecommendations: DataFrame,
              u: Option[Long] = None,
              colUser: String = "person", colItem: String = "product"): (Double, Seq[Double]) = {
    val msi = perUserMsi(dfSales, dfRecommendations, u, colUser, colItem).cache()
    try {
      val mean = msi.agg(avg(col("msi"))).first().getDouble(0)
      val perUser = msi.orderBy(col(colUser)).select(col("msi"))
        .collect().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0)).toSeq
      (mean, perUser)
    } finally msi.unpersist()
  }

  /** Driver-local check variant mirroring `novelty_refac` (:113-125): divides each
    * user's self-information sum by the constant `n` (not the list length — §2.4.3),
    * and throws if an item is missing from `freqs` (the refac KeyError semantics).
    * Test/oracle utility only.
    */
  def noveltyRefac[K](recommendations: Seq[Seq[K]], freqs: Map[K, Long],
                      u: Long, n: Int): (Double, Seq[Double]) = {
    val perUser = recommendations.map { items =>
      items.map(i => -math.log(freqs(i).toDouble / u) / math.log(2.0)).sum / n
    }
    (perUser.sum / perUser.size, perUser)
  }
}
