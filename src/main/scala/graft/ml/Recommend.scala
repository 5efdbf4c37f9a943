package graft.ml

import org.apache.spark.ml.feature.StringIndexer
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recommendation production, mirroring the reference notebook's pipeline
  * (usage_examples.ipynb cells 27-36): StringIndexer → ALS (explicit feedback,
  * nonnegative, coldStartStrategy=drop) → recommendForAllUsers(n) → explode the
  * array<struct> into long format (user, item, score) — the shape every metric in
  * [[graft.metrics]] consumes.
  *
  * Deterministic via fixed seed. ALS requires integer ids (max ~2^31 distinct keys);
  * [[indexColumn]] provides the notebook's StringIndexer path for arbitrary keys —
  * at larger cardinalities swap for a zipWithIndex-based dense remap.
  */
object Recommend {

  /** StringIndexer one column (notebook cell 28). Returns df + new column `outCol`. */
  def indexColumn(df: DataFrame, inCol: String, outCol: String): DataFrame =
    new StringIndexer().setInputCol(inCol).setOutputCol(outCol)
      .fit(df).transform(df)

  /** Fit ALS and emit top-n recommendations per user in long format. */
  def alsRecommendations(ratings: DataFrame, userCol: String, itemCol: String,
                         ratingCol: String, n: Int, rank: Int = 8,
                         maxIter: Int = 5, regParam: Double = 0.1,
                         seed: Long = 42L): DataFrame = {
    val als = new ALS()
      .setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setNonnegative(true).setImplicitPrefs(false)
      .setColdStartStrategy("drop")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam).setSeed(seed)
    val model = als.fit(ratings)
    model.recommendForAllUsers(n)
      .withColumn("rec", explode(col("recommendations")))
      .select(col(userCol), col(s"rec.$itemCol").as(itemCol),
        col("rec.rating").cast("double").as("score"))
  }
}
