package graft

import java.nio.file.Files

/** Fixture-backed checks for queries the sf-corpus oracle can't exercise.
  *
  * `q_customers_no_orders` returns 0 rows on the driver's generated data (every
  * customer has at least one order), so its oracle pass is vacuous there — this
  * spec feeds the anti-join a corpus where some customers genuinely have no
  * orders and checks the per-segment counts.
  */
class AnalyticsQueriesSpec extends SparkTestBase {
  import spark.implicits._

  test("q_customers_no_orders counts order-less customers per segment") {
    val dir = Scratch.register(Files.createTempDirectory("graft_noorders").toString)
    Seq(
      (1L, "AUTOMOBILE"), (2L, "AUTOMOBILE"), (3L, "BUILDING"),
      (4L, "BUILDING"), (5L, "MACHINERY")
    ).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // customers 2, 3, 4 never order; 5's key appears twice (dedup inside EXISTS)
    Seq((10L, 1L), (11L, 5L), (12L, 5L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = AnalyticsQueries.qCustomersNoOrders(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("AUTOMOBILE" -> 1L, "BUILDING" -> 2L))
  }
}
