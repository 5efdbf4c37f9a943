package graft.metrics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Catalog coverage of a recommender: fraction of the catalog's distinct items that
  * appear in the recommendations.
  *
  * Reference: `coverage` (/root/reference/recmetrics_pyspark/recmetrics_pyspark.py:106-110),
  * which collects both item columns to the driver and takes Python `set` sizes. We keep
  * it distributed (`countDistinct` both sides — only two longs cross to the driver) and
  * honor the `colItem` parameters, which the reference declares but ignores
  * (SURVEY.md §2.4.1, documented deviation).
  */
object Coverage {

  def coverage(dfRecommendations: DataFrame, dfCatalog: DataFrame,
               recItemCol: String, catalogItemCol: String): Double = {
    val r = dfRecommendations.agg(countDistinct(col(recItemCol))).first().getLong(0)
    val c = dfCatalog.agg(countDistinct(col(catalogItemCol))).first().getLong(0)
    r.toDouble / c
  }

  /** One-row DataFrame form (n_recommended, n_catalog, coverage) for the oracle. */
  def coverageDF(dfRecommendations: DataFrame, dfCatalog: DataFrame,
                 recItemCol: String, catalogItemCol: String): DataFrame = {
    val r = dfRecommendations.agg(countDistinct(col(recItemCol)).as("n_recommended"))
    val c = dfCatalog.agg(countDistinct(col(catalogItemCol)).as("n_catalog"))
    r.crossJoin(c)
      .withColumn("coverage", round(col("n_recommended") / col("n_catalog"), 6))
  }
}
