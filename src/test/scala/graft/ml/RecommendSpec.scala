package graft.ml

import graft.SparkTestBase
import graft.metrics.{Coverage, Novelty, Personalization}
import org.apache.spark.sql.functions.{concat, lit}

class RecommendSpec extends SparkTestBase {
  import spark.implicits._

  // small explicit-feedback matrix with clear block structure:
  // users 0-4 like items 0-4, users 5-9 like items 5-9
  private def ratings = (for {
    u <- 0 until 10
    i <- 0 until 10
    if (u < 5) == (i < 5)
  } yield (u, i, if (u % 2 == i % 2) 5.0f else 3.0f)).toDF("user", "item", "rating")

  test("ALS pipeline produces long-format top-n recs consumable by the metrics") {
    val recs = Recommend.alsRecommendations(ratings, "user", "item", "rating",
      n = 3, rank = 4, maxIter = 5).cache()
    assert(recs.columns.toSeq == Seq("user", "item", "score"))
    val perUser = recs.groupBy("user").count().collect()
    assert(perUser.length == 10 && perUser.forall(_.getLong(1) == 3L))

    // close the loop: evaluate the produced recommendations with our metrics
    val sales = ratings.select($"user".as("person"), $"item".as("product"))
    val recsPI = recs.select($"user".as("person"), $"item".as("product"))
    val cov = Coverage.coverage(recsPI, sales, "product", "product")
    assert(cov > 0.0 && cov <= 1.0)
    // block-structured ratings: recommended items can all have pop == u → msi 0
    // (±1 ulp of log2 rounding)
    val (meanNov, _) = Novelty.novelty(sales, recsPI)
    assert(meanNov >= -1e-9)
    val p = Personalization.personalization(recsPI, "person", "product")
    assert(p >= -1e-9 && p <= 1.0 + 1e-9) // ±1 ulp when all pairs are identical

  }

  test("deterministic under fixed seed") {
    def run() = Recommend.alsRecommendations(ratings, "user", "item", "rating",
      n = 2, rank = 4, maxIter = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(run() == run())
  }

  test("StringIndexer path mirrors the notebook for non-integer keys") {
    val named = ratings.select(concat(lit("u"), $"user").as("id_person"),
      concat(lit("p"), $"item").as("id_product"), $"rating")
    val indexed = Recommend.indexColumn(
      Recommend.indexColumn(named, "id_person", "person"), "id_product", "product")
    assert(indexed.select("person").distinct().count() == 10)
    val recs = Recommend.alsRecommendations(
      indexed.withColumn("person", $"person".cast("int"))
        .withColumn("product", $"product".cast("int")),
      "person", "product", "rating", n = 2, rank = 4, maxIter = 3)
    assert(recs.count() == 20)
  }
}
