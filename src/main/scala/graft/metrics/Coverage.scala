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

  /** HLL-sketch variant for extreme-cardinality catalogs: no exact-distinct shuffle,
    * each side reduces to a sketch merge (SCALE.md). `rsd` = relative standard
    * deviation of the estimate.
    */
  def approxCoverage(dfRecommendations: DataFrame, dfCatalog: DataFrame,
                     recItemCol: String, catalogItemCol: String,
                     rsd: Double = 0.01): Double = {
    val r = dfRecommendations.agg(approx_count_distinct(col(recItemCol), rsd))
      .first().getLong(0)
    val c = dfCatalog.agg(approx_count_distinct(col(catalogItemCol), rsd))
      .first().getLong(0)
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
