package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-heavy analytic queries in the TPC-H idiom over the star schema — the classic
  * OLAP shapes (selective fact-dimension joins, multi-way joins with correlated
  * predicates, top-k by aggregate) that exercise broadcast choice, join order, and
  * partial aggregation. Each has a DuckDB oracle.
  */
object AnalyticsQueries {

  /** Money/value aggregates use exact DECIMAL arithmetic: double sums differ across
    * engines in the last ulp once enough rows accumulate (observed at sf0.1:
    * 1215710442.893292 vs ...93293 before rounding), so the oracle hashes diverge.
    * Doubles cast to DECIMAL(18,4) round identically in Spark and DuckDB (inputs are
    * clean 2-decimal values), decimal sums are order-independent and exact, and the
    * final CAST(... AS DOUBLE) is deterministic IEEE on both sides.
    */
  private[graft] def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,4)")
  private[graft] def revenueDec(price: org.apache.spark.sql.Column,
                                discount: org.apache.spark.sql.Column) =
    sum(dec(price) * (lit(1).cast("decimal(18,4)") - dec(discount)))
  private[graft] val revenueDecSql =
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))))"

  /** Q3-like shipping priority: top-20 open orders by potential revenue for one
    * market segment (orders placed before the cutoff, lines shipped after it).
    */
  def qShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-06-01 00:00:00"
    Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenueDec(col("l_extendedprice"), col("l_discount")).as("rev"))
      .select(col("o_orderkey"),
        round(col("rev").cast("double"), 6).as("revenue"), col("rev"),
        unix_timestamp(col("o_orderdate")).as("orderdate_epoch"),
        col("o_orderpriority"))
      .orderBy(col("rev").desc, col("o_orderkey"))
      .limit(20)
      .drop("rev")
  }

  val shippingPrioritySql: String =
    s"""SELECT o_orderkey,
      |  ROUND(CAST($revenueDecSql AS DOUBLE), 6) AS revenue,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY $revenueDecSql DESC, o_orderkey LIMIT 20""".stripMargin

  /** Q5-like local supplier volume: revenue per nation from orders where the customer
    * and the line's supplier share the nation, for one region.
    */
  def qLocalSupplierVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AMERICA")
      .groupBy(col("n_name"))
      // per-nation volume passes 1e10 at sf1.0 — decimal-space 2-dp round
      .agg(revenueDec(col("l_extendedprice"), col("l_discount"))
          .cast("decimal(38,2)").cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"))

  val localSupplierVolumeSql: String =
    s"""SELECT n_name,
      |  CAST(ROUND($revenueDecSql, 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'AMERICA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Q10-like returned-item losses: per customer, revenue on lines flagged returned. */
  def qReturnedItemLosses(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag") === "R")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(round(revenueDec(col("l_extendedprice"), col("l_discount"))
          .cast("double"), 6).as("lost_revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("c_custkey"))

  val returnedItemLossesSql: String =
    s"""SELECT c_custkey, c_mktsegment,
      |  ROUND(CAST($revenueDecSql AS DOUBLE), 6) AS lost_revenue,
      |  COUNT(*) AS n_lines
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin

  /** Q15-like top supplier per brand: argmax-per-group via a rank-1 window over the
    * aggregated revenue — the window partitions by brand (parallel), never globally.
    * Ranking key is the EXACT decimal revenue (ties broken by s_suppkey), so Spark
    * and DuckDB pick the same winner even when doubles would tie.
    */
  def qTopSupplierBrand(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand"), col("s_suppkey"), col("s_name"))
      .agg(revenueDec(col("l_extendedprice"), col("l_discount")).as("rev"))
    val byBrand = Window.partitionBy(col("p_brand"))
      .orderBy(col("rev").desc, col("s_suppkey"))
    g.withColumn("rnk", row_number().over(byBrand))
      .filter(col("rnk") === 1)
      .select(col("p_brand"), col("s_suppkey"), col("s_name"),
        round(col("rev").cast("double"), 6).as("revenue"))
      .orderBy(col("p_brand"))
  }

  val topSupplierBrandSql: String =
    s"""WITH g AS (SELECT p_brand, s_suppkey, s_name, $revenueDecSql AS rev
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY p_brand, s_suppkey, s_name),
      |r AS (SELECT p_brand, s_suppkey, s_name, rev,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY rev DESC, s_suppkey) AS rnk
      |  FROM g)
      |SELECT p_brand, s_suppkey, s_name, ROUND(CAST(rev AS DOUBLE), 6) AS revenue
      |FROM r WHERE rnk = 1 ORDER BY p_brand""".stripMargin

  /** Per-customer order cadence: lag window partitioned by customer (parallel across
    * customers, no global sort), average gap in days between consecutive orders.
    * Only customers with ≥ 2 orders appear.
    */
  def qOrderGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val epochDay = unix_timestamp(col("o_orderdate")).cast("double") / 86400.0
    Tables.orders(spark, dir)
      .withColumn("gap_days", epochDay - lag(epochDay, 1).over(byCust))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(avg(col("gap_days")), 6).as("avg_gap_days"))
      .filter(col("n_orders") >= 2)
      .orderBy(col("o_custkey"))
  }

  val orderGapsSql: String =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    CAST(epoch(o_orderdate) AS DOUBLE) / 86400.0 AS d FROM orders),
      |g AS (SELECT o_custkey,
      |    d - lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap_days
      |  FROM o)
      |SELECT o_custkey, COUNT(*) AS n_orders,
      |  ROUND(AVG(gap_days), 6) AS avg_gap_days
      |FROM g GROUP BY o_custkey HAVING COUNT(*) >= 2 ORDER BY o_custkey""".stripMargin

  /** Q4-idiom semi-join: orders having at least one returned line, counted per
    * priority. `left_semi` never materializes the match — each order contributes
    * once no matter how many lines matched (broadcast/shuffled hash semi at the
    * physical layer); the oracle states the same thing as EXISTS.
    */
  def qOrdersWithReturns(spark: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val ordersWithReturnsSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Anti-join: customers who never placed an order, per market segment
    * (`left_anti` ⇔ NOT EXISTS).
    */
  def qCustomersNoOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  val customersNoOrdersSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Revenue subtotals at three grain levels in one pass — GROUP BY ROLLUP
    * ((brand), (brand, type), ()). Spark expands grouping sets inside a
    * single hash aggregate (one shuffle keyed on the grouping-set id + keys),
    * not one job per level. NULL grouping markers are normalized to 'ALL' so
    * both engines order and hash identically.
    */
  def qRevenueRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .rollup(col("p_brand"), col("p_type"))
      // round in DECIMAL space FIRST, then cast: rounding the DOUBLE at the
      // grand total's ~3e9 magnitude is a knife edge (the r15 sf1.0 hash
      // gate caught .36 vs .37 on a half-cent boundary the two engines'
      // double round() resolved differently); the decimal round is exact
      // and identical (HALF_UP both sides), and both engines then convert
      // the SAME 2-dp decimal to its nearest double.
      .agg(revenueDec(col("l_extendedprice"), col("l_discount"))
          .cast("decimal(38,2)").cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .select(coalesce(col("p_brand"), lit("ALL")).as("brand"),
        coalesce(col("p_type"), lit("ALL")).as("ptype"),
        col("revenue"), col("n_lines"))
      .orderBy(col("brand"), col("ptype"))

  val revenueRollupSql: String =
    s"""SELECT COALESCE(p_brand, 'ALL') AS brand,
      |  COALESCE(p_type, 'ALL') AS ptype,
      |  CAST(ROUND($revenueDecSql, 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY ROLLUP(p_brand, p_type)
      |ORDER BY 1, 2""".stripMargin

  /** Full CUBE over (status, priority) — all four grain levels in one hash
    * aggregate (grouping-set expansion, one shuffle), completing the
    * multi-grain family next to [[qRevenueRollup]] (ROLLUP) and the explicit
    * grouping-sets query. 2-dp money rounding for the same ulp reason.
    */
  def qOrderCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(dec(col("o_totalprice"))).cast("double"), 2).as("total"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("total"), col("n_orders"))
      .orderBy(col("status"), col("priority"))

  val orderCubeSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY 1, 2""".stripMargin

  private val eventTypes = Seq("view", "click", "purchase", "signup", "error")

  /** Hourly event-type matrix via `pivot` with an EXPLICIT value list — the
    * scale-safe pivot form (no distinct-value collect to the driver; one hash
    * aggregate with 5 conditional counts). The oracle states the same thing as
    * conditional aggregation.
    */
  def qEventPivot(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .withColumn("window_start",
        unix_timestamp(date_trunc("hour", col("ts"))))
      .groupBy(col("window_start"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    eventTypes.foldLeft(hourly) { (df, t) =>
      df.withColumnRenamed(t, s"n_$t")
    }.na.fill(0L, eventTypes.map(t => s"n_$t"))
      .orderBy(col("window_start"))
  }

  val eventPivotSql: String = {
    val cols = eventTypes.map { t =>
      s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t"
    }.mkString(", ")
    s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
      |  $cols
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shipping_priority" -> (qShippingPriority _),
    "q_local_supplier_volume" -> (qLocalSupplierVolume _),
    "q_returned_item_losses" -> (qReturnedItemLosses _),
    "q_top_supplier_brand" -> (qTopSupplierBrand _),
    "q_order_gaps" -> (qOrderGaps _),
    "q_orders_with_returns" -> (qOrdersWithReturns _),
    "q_customers_no_orders" -> (qCustomersNoOrders _),
    "q_revenue_rollup" -> (qRevenueRollup _),
    "q_order_cube" -> (qOrderCube _),
    "q_event_pivot" -> (qEventPivot _)
  )

  val oracleSql: Map[String, String] = Map(
    "q_shipping_priority" -> shippingPrioritySql,
    "q_local_supplier_volume" -> localSupplierVolumeSql,
    "q_returned_item_losses" -> returnedItemLossesSql,
    "q_top_supplier_brand" -> topSupplierBrandSql,
    "q_order_gaps" -> orderGapsSql,
    "q_orders_with_returns" -> ordersWithReturnsSql,
    "q_customers_no_orders" -> customersNoOrdersSql,
    "q_revenue_rollup" -> revenueRollupSql,
    "q_order_cube" -> orderCubeSql,
    "q_event_pivot" -> eventPivotSql
  )
}
