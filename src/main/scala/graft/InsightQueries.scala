package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{EventStats, Profiling, Survival, Triangles}
import graft.metrics.{ItemCF, RankingMetrics}

/** Round-5 operator batch: the rest of the ranking-metric family (MAP@k,
  * hit-rate/ARHR, serendipity, calibration, popularity bias), item-item CF
  * neighborhoods, co-purchase graph analytics (triangle census, k-core,
  * year-over-year edge drift), event-stream behavioral statistics
  * (trailing-window anomalies, burstiness, type entropy), multi-touch
  * conversion attribution, clustering quality (simplified silhouette) and
  * robust median/MAD outlier detection. Registered into [[SparkEntry]]
  * alongside [[ExtQueries]] / [[AnalyticsQueries]]; every entry has a DuckDB
  * oracle with matching column names, 6-decimal rounding and ORDER BY.
  */
object InsightQueries {

  import SparkEntry.{sales, recommendations, salesSql, recsSql}

  // -------------------------------------------------------------------------
  // Ranking-metric family completion
  // -------------------------------------------------------------------------

  /** MAP@10 per user: average precision of the frequency-ranked urgent-order
    * recommendations against finalized-order actuals.
    */
  def qMapAtK(spark: SparkSession, dir: String): DataFrame =
    RankingMetrics.mapAtK(recommendations(spark, dir), sales(spark, dir),
        "user_id", "item_id", k = 10)
      .orderBy(col("user"))

  val mapAtKSql: String =
    s"""WITH $salesSql,
      |$recsSql,
      |rc AS (SELECT user_id AS "user", item_id AS item, COUNT(*) AS n
      |       FROM recs GROUP BY 1, 2),
      |rk AS (SELECT "user", item,
      |    ROW_NUMBER() OVER (PARTITION BY "user" ORDER BY n DESC, item) AS rnk
      |  FROM rc),
      |topk AS (SELECT * FROM rk WHERE rnk <= 10),
      |a AS (SELECT DISTINCT user_id AS "user", item_id AS item FROM sales),
      |f AS (SELECT t."user", t.rnk,
      |    CASE WHEN a.item IS NULL THEN 0 ELSE 1 END AS hit
      |  FROM topk t LEFT JOIN a ON t."user" = a."user" AND t.item = a.item),
      |c AS (SELECT "user", rnk, hit,
      |    SUM(hit) OVER (PARTITION BY "user" ORDER BY rnk) AS cum FROM f),
      |t AS (SELECT "user", SUM(hit) AS n_hits_at_k,
      |    SUM(CASE WHEN hit = 1 THEN cum * (2520 // rnk) ELSE 0 END) AS ap_num
      |  FROM c GROUP BY 1),
      |na AS (SELECT "user", COUNT(*) AS n_actual FROM a GROUP BY 1),
      |fin AS (SELECT na."user", na.n_actual,
      |    CAST(COALESCE(t.n_hits_at_k, 0) AS BIGINT) AS n_hits_at_k,
      |    CAST(COALESCE(t.ap_num, 0) AS BIGINT) AS s,
      |    2520 * LEAST(10, na.n_actual) AS d
      |  FROM na LEFT JOIN t ON na."user" = t."user")
      |SELECT "user", n_actual, n_hits_at_k,
      |  CAST((2000000 * s + d) // (2 * d) AS DOUBLE) / 1000000.0 AS ap
      |FROM fin ORDER BY "user"""".stripMargin

  /** Corpus hit-rate@10 + ARHR of the same rec/actual pair — 1 row. */
  def qHitRate(spark: SparkSession, dir: String): DataFrame =
    RankingMetrics.hitRateAtK(recommendations(spark, dir), sales(spark, dir),
      "user_id", "item_id", k = 10)

  val hitRateSql: String =
    s"""WITH $salesSql,
      |$recsSql,
      |rc AS (SELECT user_id AS "user", item_id AS item, COUNT(*) AS n
      |       FROM recs GROUP BY 1, 2),
      |rk AS (SELECT "user", item,
      |    ROW_NUMBER() OVER (PARTITION BY "user" ORDER BY n DESC, item) AS rnk
      |  FROM rc),
      |a AS (SELECT DISTINCT user_id AS "user", item_id AS item FROM sales),
      |fh AS (SELECT rk."user", MIN(rk.rnk) AS first_hit
      |  FROM rk JOIN a ON rk."user" = a."user" AND rk.item = a.item
      |  WHERE rk.rnk <= 10 GROUP BY 1),
      |u AS (SELECT DISTINCT "user" FROM rc)
      |SELECT 10 AS k, COUNT(*) AS n_users, COUNT(fh.first_hit) AS n_users_hit,
      |  ROUND(COUNT(fh.first_hit) * 1.0 / COUNT(*), 6) AS hit_rate,
      |  ROUND(CAST(SUM(COALESCE(CAST(1.0 / fh.first_hit AS DECIMAL(18,8)),
      |      CAST(0 AS DECIMAL(18,8)))) AS DOUBLE) / COUNT(*), 6) AS arhr
      |FROM u LEFT JOIN fh ON u."user" = fh."user"""".stripMargin

  /** Serendipity per user: relevant-AND-unexpected share of recommendations,
    * "expected" = the 100 most-popular sales items.
    */
  def qSerendipity(spark: SparkSession, dir: String): DataFrame =
    RankingMetrics.serendipity(recommendations(spark, dir), sales(spark, dir),
        "user_id", "item_id", topN = 100)
      .orderBy(col("user"))

  val serendipitySql: String =
    s"""WITH $salesSql,
      |$recsSql,
      |r AS (SELECT DISTINCT user_id AS "user", item_id AS item FROM recs),
      |a AS (SELECT DISTINCT user_id AS "user", item_id AS item FROM sales),
      |pop AS (SELECT item FROM a GROUP BY item
      |        ORDER BY COUNT(DISTINCT "user") DESC, item LIMIT 100),
      |h AS (SELECT r."user", r.item FROM r JOIN a
      |      ON r."user" = a."user" AND r.item = a.item),
      |nh AS (SELECT "user", COUNT(*) AS n_hits FROM h GROUP BY 1),
      |ns AS (SELECT "user", COUNT(*) AS n_serendipitous FROM h
      |       WHERE item NOT IN (SELECT item FROM pop) GROUP BY 1),
      |nr AS (SELECT "user", COUNT(*) AS n_recs FROM r GROUP BY 1)
      |SELECT nr."user", nr.n_recs, COALESCE(nh.n_hits, 0) AS n_hits,
      |  COALESCE(ns.n_serendipitous, 0) AS n_serendipitous,
      |  ROUND(COALESCE(ns.n_serendipitous, 0) * 1.0 / nr.n_recs, 6) AS serendipity
      |FROM nr LEFT JOIN nh ON nr."user" = nh."user"
      |LEFT JOIN ns ON nr."user" = ns."user"
      |ORDER BY nr."user"""".stripMargin

  /** Calibration overlap per user: how well the brand mix of recommendations
    * matches the brand mix of purchase history (1 − total-variation distance).
    */
  def qCalibration(spark: SparkSession, dir: String): DataFrame = {
    def withBrand(df: DataFrame, spark: SparkSession): DataFrame =
      df.join(Tables.part(spark, dir), col("item_id") === col("p_partkey"))
        .select(col("user_id"), col("p_brand").as("brand"))
    RankingMetrics.calibrationOverlap(
        withBrand(sales(spark, dir), spark),
        withBrand(recommendations(spark, dir), spark),
        "user_id", "brand")
      .orderBy(col("user"))
  }

  val calibrationSql: String =
    s"""WITH $salesSql,
      |$recsSql,
      |hb AS (SELECT s.user_id AS "user", p.p_brand AS feat, COUNT(*) AS n
      |       FROM sales s JOIN part p ON s.item_id = p.p_partkey GROUP BY 1, 2),
      |rb AS (SELECT r.user_id AS "user", p.p_brand AS feat, COUNT(*) AS n
      |       FROM recs r JOIN part p ON r.item_id = p.p_partkey GROUP BY 1, 2),
      |ht AS (SELECT "user", SUM(n) AS tot, COUNT(*) AS n_feat_hist FROM hb GROUP BY 1),
      |rt AS (SELECT "user", SUM(n) AS tot, COUNT(*) AS n_feat_rec FROM rb GROUP BY 1),
      |u AS (SELECT ht."user", ht.tot AS th, rt.tot AS tr,
      |       ht.n_feat_hist, rt.n_feat_rec
      |  FROM ht JOIN rt ON ht."user" = rt."user"),
      |ov AS (SELECT hb."user",
      |       CAST(SUM(LEAST(hb.n * u.tr, rb.n * u.th)) AS BIGINT) AS num
      |  FROM hb JOIN rb ON hb."user" = rb."user" AND hb.feat = rb.feat
      |  JOIN u ON hb."user" = u."user" GROUP BY 1)
      |SELECT u."user", u.n_feat_hist, u.n_feat_rec,
      |  ROUND(COALESCE(ov.num, 0) * 1.0 / (u.th * u.tr), 6) AS overlap
      |FROM u LEFT JOIN ov ON u."user" = ov."user"
      |ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------------
  // Item-item CF + co-purchase graph
  // -------------------------------------------------------------------------

  /** "Customers who bought X also bought Y": top-3 cosine neighbors per part
    * over finalized-order baskets (min item support 5, whale-basket cap 50).
    */
  def qItemCf(spark: SparkSession, dir: String): DataFrame =
    ItemCF.itemNeighbors(sales(spark, dir), "user_id", "item_id",
        k = 3, minSupport = 5, maxBasket = 50)
      .orderBy(col("item_id"), col("rnk"))

  val itemCfSql: String =
    s"""WITH $salesSql,
      |b0 AS (SELECT DISTINCT user_id, item_id FROM sales),
      |ku AS (SELECT user_id FROM b0 GROUP BY 1 HAVING COUNT(*) <= 50),
      |ni AS (SELECT item_id, COUNT(*) AS n_users
      |       FROM b0 JOIN ku USING (user_id) GROUP BY 1 HAVING COUNT(*) >= 5),
      |b AS (SELECT b0.user_id, b0.item_id, ni.n_users
      |      FROM b0 JOIN ku USING (user_id) JOIN ni USING (item_id)),
      |co AS (SELECT x.item_id AS i, y.item_id AS j,
      |    x.n_users AS ni, y.n_users AS nj, COUNT(*) AS n_both
      |  FROM b x JOIN b y ON x.user_id = y.user_id AND x.item_id < y.item_id
      |  GROUP BY 1, 2, 3, 4),
      |d AS (SELECT i AS item_id, j AS neighbor_id, ni AS n_item,
      |        nj AS n_neighbor, n_both FROM co
      |      UNION ALL
      |      SELECT j, i, nj, ni, n_both FROM co),
      |s AS (SELECT *, n_both / SQRT(n_item * n_neighbor) AS cosine FROM d),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY item_id
      |         ORDER BY cosine DESC, neighbor_id) AS rnk FROM s)
      |SELECT item_id, neighbor_id, n_item, n_neighbor, n_both,
      |  ROUND(cosine, 6) AS cosine, rnk
      |FROM rk WHERE rnk <= 3 ORDER BY item_id, rnk""".stripMargin

  /** Repeat-co-purchase edges: parts appearing together in ≥2 DISTINCT orders.
    * The support floor is the market-basket minSupport idea applied to graph
    * construction — single co-occurrences on a dense catalog are noise, and
    * they also dominate the wedge volume (the raw ≥1 graph at sf0.1 has 1.2M
    * edges / 72M wedges, the signal graph 3.6k / 1.4k). Shared by
    * [[qTriangles]] and [[qKcore]].
    */
  private[graft] def repeatEdges(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // basket form: ONE order-keyed set aggregate (partial map-side) replaces
    // the two-sided self-join shuffle; pairs generate map-side from each
    // basket, bounded by basket size², and the distinct-order count becomes a
    // plain count because a set yields each pair at most once per order
    l.groupBy(col("ok")).agg(collect_set(col("pk")).as("parts"))
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"), explode(col("parts")).as("dst"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2)
      .select(col("src"), col("dst"))
  }

  private[graft] val repeatEdgesSql =
    """e AS (SELECT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT x.l_orderkey) >= 2)""".stripMargin

  /** Triangle census of the repeat-co-purchase graph (the oracle's a<b<c
    * three-way join states the same count the degree-oriented wedge join
    * computes).
    */
  def qTriangles(spark: SparkSession, dir: String): DataFrame =
    Triangles.triangleCensus(repeatEdges(spark, dir), "src", "dst")

  /** BFS level histogram from the repeat-co-purchase graph's busiest hub
    * ([[graft.ext.GraphPaths.bfsLevels]], depth cap 10): how much of the
    * graph sits within r hops of the max-degree part — the reachability
    * fingerprint next to q_assortativity's mixing summary.
    */
  def qBfsLevels(spark: SparkSession, dir: String): DataFrame =
    graft.ext.GraphPaths.bfsLevels(repeatEdges(spark, dir), "src", "dst",
      maxDepth = 10)

  val bfsLevelsSql: String =
    s"""WITH RECURSIVE $repeatEdgesSql,
      |bt AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
      |seed AS (SELECT u AS node FROM bt GROUP BY 1
      |  ORDER BY COUNT(*) DESC, u LIMIT 1),
      |reach(id, d) AS (
      |  SELECT node, 0 FROM seed
      |  UNION
      |  SELECT bt.v, r.d + 1 FROM reach r JOIN bt ON bt.u = r.id
      |  WHERE r.d < 10),
      |lv AS (SELECT id, MIN(d) AS level FROM reach GROUP BY 1)
      |SELECT level, COUNT(*) AS n_nodes FROM lv GROUP BY 1 ORDER BY 1""".stripMargin

  /** Degree assortativity of the repeat-co-purchase graph
    * ([[Triangles.assortativity]]): r < 0 = hub-and-spoke (popular parts
    * attach to one-off parts), r > 0 = hubs cluster — the structural summary
    * that says whether the degree-oriented tricks in q_triangles/q_kcore are
    * load-bearing on this graph.
    */
  def qAssortativity(spark: SparkSession, dir: String): DataFrame =
    Triangles.assortativity(repeatEdges(spark, dir), "src", "dst")

  val assortativitySql: String =
    s"""WITH $repeatEdgesSql,
      |deg AS (SELECT node, COUNT(*) AS deg FROM
      |  (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      |p AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
      |j AS (SELECT dx.deg AS dx, dy.deg AS dy FROM p
      |  JOIN deg dx ON p.x = dx.node JOIN deg dy ON p.y = dy.node),
      |m AS (SELECT COUNT(*) AS n2,
      |    CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
      |    CAST(SUM(dx * dy) AS BIGINT) AS sxy,
      |    CAST(SUM(dx * dx) AS BIGINT) AS sxx,
      |    CAST(SUM(dy * dy) AS BIGINT) AS syy FROM j),
      |r AS (SELECT
      |    CAST(n2 AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |    sqrt((CAST(n2 AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n2 AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS den FROM m)
      |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
      |  (SELECT COUNT(*) FROM e) AS n_edges,
      |  ROUND(num / (CASE WHEN den = 0.0 THEN NULL ELSE den END), 6)
      |    AS assortativity
      |FROM r""".stripMargin

  val trianglesSql: String =
    s"""WITH $repeatEdgesSql,
      |deg AS (SELECT node, COUNT(*) AS deg FROM
      |  (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      |tri AS (SELECT COUNT(*) AS n_triangles
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3
      |  ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
      |  (SELECT COUNT(*) FROM e) AS n_edges,
      |  (SELECT CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
      |  (SELECT n_triangles FROM tri) AS n_triangles,
      |  ROUND(3.0 * (SELECT n_triangles FROM tri)
      |    / (SELECT SUM(deg * (deg - 1)) / 2 FROM deg), 6) AS global_clustering""".stripMargin

  /** 2-hop candidate generation over the repeat-co-purchase graph: for each
    * part, the top-3 parts reachable through a common neighbor but NOT
    * directly co-purchased — the classic "customers who bought what you
    * bought also bought" expansion ranked by distinct-path support. The
    * direct-edge exclusion is a left-anti join, and both hop joins shuffle on
    * node keys (wedge volume Σ deg² is the cost driver — bounded here by the
    * ≥2-support signal graph, by degree caps at web scale).
    */
  def qTwoHopRecs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // undirected adjacency from ONE generator (the union-of-projections shape
    // re-runs the edge aggregate per branch); the edge table is iterated over
    // three differently-keyed branches, so materialize it once
    val adj = repeatEdges(spark, dir).select(explode(array(
        struct(col("src").as("u"), col("dst").as("v")),
        struct(col("dst").as("u"), col("src").as("v")))).as("p"))
      .select(col("p.u"), col("p.v"))
      .localCheckpoint(eager = true)
    val hop2 = adj.as("x").join(adj.as("y"), col("x.v") === col("y.u"))
      .filter(col("x.u") =!= col("y.v"))
      .groupBy(col("x.u").as("item_id"), col("y.v").as("rec_id"))
      .agg(countDistinct(col("x.v")).as("n_paths"))
    val indirect = hop2.join(
      adj.select(col("u").as("item_id"), col("v").as("rec_id")),
      Seq("item_id", "rec_id"), "left_anti")
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("n_paths").desc, col("rec_id"))
    indirect.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .orderBy(col("item_id"), col("rnk"))
  }

  val twoHopRecsSql: String =
    s"""WITH $repeatEdgesSql,
      |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
      |h AS (SELECT x.u AS item_id, y.v AS rec_id,
      |    COUNT(DISTINCT x.v) AS n_paths
      |  FROM adj x JOIN adj y ON x.v = y.u WHERE x.u <> y.v GROUP BY 1, 2),
      |r AS (SELECT h.* FROM h WHERE NOT EXISTS (SELECT 1 FROM adj
      |    WHERE adj.u = h.item_id AND adj.v = h.rec_id)),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY item_id
      |    ORDER BY n_paths DESC, rec_id) AS rnk FROM r)
      |SELECT item_id, rec_id, n_paths, rnk FROM rk WHERE rnk <= 3
      |ORDER BY item_id, rnk""".stripMargin

  /** Temporal split-leakage audit: fraction of each user's post-cutoff
    * (user, item) holdout pairs already present pre-cutoff. A time-based
    * evaluation split silently turns into re-purchase prediction when this is
    * high — the standard pre-training sanity check on interaction splits.
    * Both sides reduce to distinct pairs before the semi-join, so the probe
    * is keyed and partial-aggregated all the way down.
    */
  def qSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1999-01-01").cast("timestamp")
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"),
        col("o_orderdate"))
    val train = pairs.filter(col("o_orderdate") < cutoff)
      .select("user_id", "item_id").distinct()
    val test = pairs.filter(col("o_orderdate") >= cutoff)
      .select("user_id", "item_id").distinct()
    val leaked = test.join(train, Seq("user_id", "item_id"), "left_semi")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_leaked"))
    test.groupBy(col("user_id")).agg(count(lit(1)).as("n_test_pairs"))
      .join(leaked, Seq("user_id"), "left").na.fill(0L, Seq("n_leaked"))
      .select(col("user_id"), col("n_test_pairs"), col("n_leaked"),
        round(col("n_leaked").cast("double") / col("n_test_pairs"), 6)
          .as("leakage"))
      .orderBy(col("user_id"))
  }

  val splitLeakageSql: String =
    """WITH p AS (SELECT o_custkey AS user_id, l_partkey AS item_id, o_orderdate
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |tr AS (SELECT DISTINCT user_id, item_id FROM p
      |       WHERE o_orderdate < TIMESTAMP '1999-01-01'),
      |te AS (SELECT DISTINCT user_id, item_id FROM p
      |       WHERE o_orderdate >= TIMESTAMP '1999-01-01'),
      |lk AS (SELECT user_id, COUNT(*) AS n_leaked FROM te
      |  WHERE EXISTS (SELECT 1 FROM tr
      |    WHERE tr.user_id = te.user_id AND tr.item_id = te.item_id)
      |  GROUP BY 1),
      |nt AS (SELECT user_id, COUNT(*) AS n_test_pairs FROM te GROUP BY 1)
      |SELECT nt.user_id, nt.n_test_pairs, COALESCE(lk.n_leaked, 0) AS n_leaked,
      |  ROUND(COALESCE(lk.n_leaked, 0) * 1.0 / nt.n_test_pairs, 6) AS leakage
      |FROM nt LEFT JOIN lk ON nt.user_id = lk.user_id
      |ORDER BY nt.user_id""".stripMargin

  // -------------------------------------------------------------------------
  // Event-stream behavioral statistics
  // -------------------------------------------------------------------------

  /** Kaplan-Meier view→purchase conversion curve: per-user duration from
    * first view to first subsequent purchase in days, non-converters
    * right-censored at the corpus horizon ([[graft.ext.Survival.kaplanMeier]]
    * documents the estimator and its determinism discipline).
    */
  def qSurvival(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(unix_millis(col("ts"))).as("t0"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("tp"))
    val conv = v.join(p, Seq("user_id")).filter(col("tp") >= col("t0"))
      .groupBy(col("user_id")).agg(min(col("tp")).as("t1"))
    val horizon = e.agg(max(unix_millis(col("ts"))).as("mx"))
    val durations = v.join(conv, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        floor((coalesce(col("t1"), col("mx")) - col("t0")) / lit(86400000.0))
          .cast("long").as("t_days"),
        when(col("t1").isNotNull, 1).otherwise(0).as("converted"))
    Survival.kaplanMeier(durations, "t_days", "converted").orderBy(col("t"))
  }

  val survivalSql: String =
    """WITH v AS (SELECT user_id, MIN(epoch_ms(ts)) AS t0 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |p AS (SELECT user_id, epoch_ms(ts) AS tp FROM events
      |  WHERE event_type = 'purchase'),
      |cv AS (SELECT v.user_id, MIN(p.tp) AS t1 FROM v JOIN p
      |  ON v.user_id = p.user_id AND p.tp >= v.t0 GROUP BY 1),
      |mx AS (SELECT MAX(epoch_ms(ts)) AS mx FROM events),
      |dur AS (SELECT
      |    CAST(FLOOR((COALESCE(cv.t1, mx.mx) - v.t0) / 86400000.0) AS BIGINT)
      |      AS t,
      |    CASE WHEN cv.t1 IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM v LEFT JOIN cv ON v.user_id = cv.user_id CROSS JOIN mx),
      |bt AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS n_events,
      |    CAST(SUM(1 - ev) AS BIGINT) AS n_censored FROM dur GROUP BY 1),
      |tt AS (SELECT CAST(SUM(n_events + n_censored) AS BIGINT) AS total FROM bt),
      |rk AS (SELECT bt.*, CAST(tt.total - COALESCE(SUM(n_events + n_censored)
      |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS n_at_risk
      |  FROM bt CROSS JOIN tt),
      |lg AS (SELECT *, CAST(CASE WHEN n_events = 0 THEN 0.0
      |    WHEN n_events < n_at_risk
      |      THEN ln(1.0 - n_events * 1.0 / n_at_risk)
      |    ELSE -50.0 END AS DECIMAL(18,8)) AS log_term FROM rk)
      |SELECT t, n_at_risk, n_events, n_censored,
      |  ROUND(EXP(CAST(SUM(log_term) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)
      |    AS survival
      |FROM lg ORDER BY t""".stripMargin

  /** Most common within-session event-type paths (30-minute gap sessions). */
  def qTopPaths(spark: SparkSession, dir: String): DataFrame =
    graft.ext.EventWindows.topSessionPaths(Tables.events(spark, dir),
      gapMinutes = 30, topN = 20)

  val topPathsSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
      |  FROM events),
      |f AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
      |      OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
      |s AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM f),
      |p AS (SELECT user_id, sid,
      |    string_agg(event_type, '>' ORDER BY ms, event_id) AS path
      |  FROM s GROUP BY 1, 2)
      |SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  /** DAU plus trailing-7-day rolling distinct actives per observed day. */
  def qRollingDau(spark: SparkSession, dir: String): DataFrame =
    EventStats.rollingActiveUsers(Tables.events(spark, dir), "ts", "user_id",
        windowDays = 7)
      .orderBy(col("day"))

  val rollingDauSql: String =
    """WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
      |  FROM events),
      |mx AS (SELECT MAX(d) AS max_d FROM ud),
      |c AS (SELECT DISTINCT u, d + x.i AS day
      |  FROM ud CROSS JOIN (SELECT CAST(unnest(generate_series(0, 6)) AS INTEGER)
      |    AS i) x
      |  CROSS JOIN mx WHERE d + x.i <= mx.max_d),
      |w AS (SELECT day, COUNT(*) AS wau FROM c GROUP BY 1),
      |da AS (SELECT d AS day, COUNT(*) AS dau FROM ud GROUP BY 1)
      |SELECT da.day, da.dau, w.wau FROM da JOIN w USING (day)
      |ORDER BY day""".stripMargin

  /** Connected components of the repeat-co-purchase graph — product families
    * that sell together, via the SAME pointer-jumping CC machinery the dedup
    * pipeline uses ([[graft.ext.Dedup.dupClusters]]): operators compose
    * across domains. Oracle: transitive min-reachability recursive CTE.
    */
  def qCopurchaseCc(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Dedup.dupClusters(
        repeatEdges(spark, dir)
          .select(col("src").as("id_a"), col("dst").as("id_b")))
      .orderBy(col("id"))

  val copurchaseCcSql: String =
    s"""WITH RECURSIVE $repeatEdgesSql,
      |edges AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
      |reach(id, r) AS (
      |      SELECT a, a FROM edges UNION SELECT a, b FROM edges
      |      UNION SELECT eg.a, r.r FROM edges eg JOIN reach r ON eg.b = r.id)
      |SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Weekly-seasonal volume anomalies: day vs same-day-of-week median. */
  def qSeasonalBaseline(spark: SparkSession, dir: String): DataFrame =
    EventStats.seasonalAnomalies(Tables.events(spark, dir), "ts", "event_type")
      .orderBy(col("event_type"), col("day"))

  val seasonalBaselineSql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |dw AS (SELECT *, CAST(isodow(day) AS BIGINT) AS dow FROM d),
      |m AS (SELECT event_type, dow, QUANTILE_CONT(n_events, 0.5) AS dow_median,
      |    COUNT(*) AS n_weeks FROM dw GROUP BY 1, 2)
      |SELECT dw.event_type, dw.day, dw.dow, dw.n_events, m.n_weeks,
      |  ROUND(m.dow_median, 6) AS dow_median,
      |  ROUND(dw.n_events / m.dow_median, 6) AS ratio,
      |  (dw.n_events > 1.5 * m.dow_median OR dw.n_events < 0.5 * m.dow_median)
      |    AS is_anomaly
      |FROM dw JOIN m USING (event_type, dow)
      |ORDER BY event_type, day""".stripMargin

  /** Churn-model label + feature builder: per (user, month) activity with the
    * churned-next-month label — the supervised-training counterpart of
    * `q_churn`'s aggregate rates. Leakage-free by construction: features come
    * from month M only, the label from M+1, and the final month (whose label
    * is unobservable) is excluded via a broadcast 1-row horizon.
    */
  def qChurnLabels(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val m = o.groupBy(col("o_custkey").as("user_id"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(AnalyticsQueries.dec(col("o_totalprice"))).cast("double"), 6)
          .as("spend"))
    val horizon = m.agg(max(col("month")).as("max_m"))
    val nextActive = m.select(col("user_id"),
        add_months(col("month"), -1).as("month"))
      .distinct().withColumn("next_flag", lit(true))
    m.join(nextActive, Seq("user_id", "month"), "left")
      .crossJoin(broadcast(horizon))
      .filter(col("month") < col("max_m"))
      .select(col("user_id"), col("month"), col("n_orders"), col("spend"),
        coalesce(col("next_flag"), lit(false)).as("active_next"),
        col("next_flag").isNull.as("churned"))
      .orderBy(col("user_id"), col("month"))
  }

  val churnLabelsSql: String =
    """WITH m AS (SELECT o_custkey AS user_id,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    COUNT(*) AS n_orders,
      |    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
      |      AS spend
      |  FROM orders GROUP BY 1, 2),
      |mx AS (SELECT MAX(month) AS max_m FROM m),
      |nx AS (SELECT DISTINCT user_id,
      |    CAST(month - INTERVAL 1 MONTH AS DATE) AS month FROM m)
      |SELECT m.user_id, m.month, m.n_orders, m.spend,
      |  (nx.user_id IS NOT NULL) AS active_next,
      |  (nx.user_id IS NULL) AS churned
      |FROM m CROSS JOIN mx
      |LEFT JOIN nx ON m.user_id = nx.user_id AND m.month = nx.month
      |WHERE m.month < mx.max_m
      |ORDER BY m.user_id, m.month""".stripMargin

  /** 10-90% trimmed mean of line price per brand — the robust central
    * tendency for skew/outlier-heavy money columns (a fat-finger price or a
    * whale order moves a plain mean; the trimmed mean ignores both tails).
    * Exact per-group percentiles bound the kept range (identical
    * interpolation in both engines, the q_mad_outliers precedent); the kept
    * sum goes through DECIMAL so the mean is partition-order-independent.
    */
  def qTrimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        col("l_extendedprice").cast("double").as("v"))
    val q = x.groupBy(col("brand"))
      .agg(percentile(col("v"), lit(0.1)).as("lo"),
        percentile(col("v"), lit(0.9)).as("hi"),
        count(lit(1)).as("n_all"))
    x.join(q, Seq("brand"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy(col("brand"))
      .agg(max(col("n_all")).as("n_all"), count(lit(1)).as("n_kept"),
        round(max(col("lo")), 6).as("p10"),
        round(max(col("hi")), 6).as("p90"),
        round(sum(AnalyticsQueries.dec(col("v"))).cast("double") /
          count(lit(1)), 6).as("trimmed_mean"))
      .orderBy(col("brand"))
  }

  val trimmedMeanSql: String =
    """WITH x AS (SELECT p_brand AS brand, CAST(l_extendedprice AS DOUBLE) AS v
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |q AS (SELECT brand, QUANTILE_CONT(v, 0.1) AS lo, QUANTILE_CONT(v, 0.9) AS hi,
      |    COUNT(*) AS n_all FROM x GROUP BY 1)
      |SELECT x.brand, MAX(q.n_all) AS n_all, COUNT(*) AS n_kept,
      |  ROUND(MAX(q.lo), 6) AS p10, ROUND(MAX(q.hi), 6) AS p90,
      |  ROUND(CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
      |    AS trimmed_mean
      |FROM x JOIN q USING (brand) WHERE v >= q.lo AND v <= q.hi
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Stage-to-stage funnel latency percentiles: among users who complete each
    * transition of the strict view→click→purchase funnel, the median and p90
    * dwell times — the "WHERE is the funnel slow" companion to `q_funnel`'s
    * "where does it leak" counts. The per-stage tables reuse the funnel's
    * monotone-shrinking min-timestamp joins; the final percentiles run over
    * one row per completing user.
    */
  def qFunnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ms")).as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ms") >= col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("ms")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c.select(col("user_id"), col("t2")), Seq("user_id"))
      .filter(col("ms") >= col("t2"))
      .groupBy(col("user_id"), col("t2")).agg(min(col("ms")).as("t3"))
    val l1 = c.agg(count(lit(1)).as("n_users"),
      percentile(col("t2") - col("t1"), lit(0.5)).as("p50"),
      percentile(col("t2") - col("t1"), lit(0.9)).as("p90"))
      .select(lit("view>click").as("stage"), col("n_users"),
        round(col("p50"), 6).as("p50_ms"), round(col("p90"), 6).as("p90_ms"))
    val l2 = p.agg(count(lit(1)).as("n_users"),
      percentile(col("t3") - col("t2"), lit(0.5)).as("p50"),
      percentile(col("t3") - col("t2"), lit(0.9)).as("p90"))
      .select(lit("click>purchase").as("stage"), col("n_users"),
        round(col("p50"), 6).as("p50_ms"), round(col("p90"), 6).as("p90_ms"))
    l1.unionAll(l2).orderBy(col("stage"))
  }

  val funnelLatencySql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |v AS (SELECT user_id, MIN(ms) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, v.t1, MIN(e.ms) AS t2 FROM e
      |  JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ms >= v.t1 GROUP BY 1, 2),
      |p AS (SELECT e.user_id, c.t2, MIN(e.ms) AS t3 FROM e
      |  JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ms >= c.t2 GROUP BY 1, 2)
      |SELECT 'view>click' AS stage, COUNT(*) AS n_users,
      |  ROUND(QUANTILE_CONT(t2 - t1, 0.5), 6) AS p50_ms,
      |  ROUND(QUANTILE_CONT(t2 - t1, 0.9), 6) AS p90_ms FROM c
      |UNION ALL
      |SELECT 'click>purchase', COUNT(*),
      |  ROUND(QUANTILE_CONT(t3 - t2, 0.5), 6),
      |  ROUND(QUANTILE_CONT(t3 - t2, 0.9), 6) FROM p
      |ORDER BY stage""".stripMargin

  /** Theil-Sen robust daily-volume trend per event type. */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame =
    EventStats.theilSenTrend(Tables.events(spark, dir), "ts", "event_type")
      .orderBy(col("event_type"))

  val theilSenSql: String =
    """WITH d AS (SELECT event_type,
      |    CAST(ts AS DATE) - DATE '1970-01-01' AS x, COUNT(*) AS y
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
      |p AS (SELECT a.event_type, (b.y - a.y) * 1.0 / (b.x - a.x) AS s
      |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x),
      |m AS (SELECT event_type, QUANTILE_CONT(s, 0.5) AS slope FROM p GROUP BY 1)
      |SELECT d.event_type, COUNT(*) AS n_days,
      |  ROUND(MAX(m.slope), 6) AS slope_per_day,
      |  ROUND(QUANTILE_CONT(d.y - m.slope * d.x, 0.5), 6) AS intercept
      |FROM d JOIN m USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Order-to-ship latency percentiles per order priority — the operational
    * SLA view (does URGENT actually ship faster?). Exact p50/p90 over the
    * per-line day lag, grouped by the priority dimension.
    */
  def qShipLatency(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("double")
          .as("lag_days"))
    x.groupBy(col("priority"))
      .agg(count(lit(1)).as("n_lines"),
        round(percentile(col("lag_days"), lit(0.5)), 6).as("p50_days"),
        round(percentile(col("lag_days"), lit(0.9)), 6).as("p90_days"),
        round(max(col("lag_days")), 6).as("max_days"))
      .orderBy(col("priority"))
  }

  val shipLatencySql: String =
    """WITH x AS (SELECT o_orderpriority AS priority,
      |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS DOUBLE)
      |      AS lag_days
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      |SELECT priority, COUNT(*) AS n_lines,
      |  ROUND(QUANTILE_CONT(lag_days, 0.5), 6) AS p50_days,
      |  ROUND(QUANTILE_CONT(lag_days, 0.9), 6) AS p90_days,
      |  ROUND(MAX(lag_days), 6) AS max_days
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-brand return rate with a 95% Wilson score interval — the
    * small-sample-honest version of the naive rate (a brand with 2 returns
    * out of 3 lines should NOT outrank one with 200/350; the Wilson lower
    * bound encodes exactly that). Closed-form arithmetic from exact integer
    * counts with the z=1.96 literal embedded identically in both engines.
    */
  def qReturnRateCi(spark: SparkSession, dir: String): DataFrame = {
    val z = 1.96
    val x = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"))
    val n = col("n_lines").cast("double")
    val p = col("n_returned").cast("double") / n
    val z2 = lit(z * z)
    val center = (p + z2 / (lit(2.0) * n)) / (lit(1.0) + z2 / n)
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))) /
      (lit(1.0) + z2 / n)
    x.select(col("brand"), col("n_lines"), col("n_returned"),
        round(p, 6).as("rate"),
        round(center - half, 6).as("wilson_lo"),
        round(center + half, 6).as("wilson_hi"))
      .orderBy(col("brand"))
  }

  val returnRateCiSql: String =
    """WITH x AS (SELECT p_brand AS brand, COUNT(*) AS n_lines,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_returned
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      |c AS (SELECT brand, n_lines, n_returned, CAST(n_lines AS DOUBLE) AS n,
      |    CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) AS p,
      |    CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2
      |  FROM x)
      |SELECT brand, n_lines, n_returned, ROUND(p, 6) AS rate,
      |  ROUND((p + z2 / (2.0 * n)) / (1.0 + z2 / n)
      |    - (CAST(1.96 AS DOUBLE) * sqrt(p * (1.0 - p) / n
      |        + z2 / (4.0 * n * n))) / (1.0 + z2 / n), 6) AS wilson_lo,
      |  ROUND((p + z2 / (2.0 * n)) / (1.0 + z2 / n)
      |    + (CAST(1.96 AS DOUBLE) * sqrt(p * (1.0 - p) / n
      |        + z2 / (4.0 * n * n))) / (1.0 + z2 / n), 6) AS wilson_hi
      |FROM c ORDER BY brand""".stripMargin

  /** Order basket-size distribution: how many orders carry k lines, with the
    * cumulative order share — the shape parameter behind every co-purchase
    * operator's cost model (wedge counts grow with Σ basket²).
    */
  def qBasketSizeDist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("basket_size"))
      .groupBy(col("basket_size")).agg(count(lit(1)).as("n_orders"))
    val total = sizes.agg(sum(col("n_orders")).as("n_total"))
    val w = Window.orderBy(col("basket_size"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the distribution table is bounded by max basket size — tiny; the
    // single-partition cumulative window is safe by construction
    sizes.crossJoin(broadcast(total))
      .select(col("basket_size"), col("n_orders"),
        sum(col("n_orders")).over(w).as("cum_orders"),
        round(sum(col("n_orders")).over(w).cast("double") / col("n_total"), 6)
          .as("cum_share"))
      .orderBy(col("basket_size"))
  }

  val basketSizeDistSql: String =
    """WITH s AS (SELECT l_orderkey, COUNT(*) AS basket_size FROM lineitem
      |  GROUP BY 1),
      |d AS (SELECT basket_size, COUNT(*) AS n_orders FROM s GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM d)
      |SELECT basket_size, n_orders,
      |  CAST(SUM(n_orders) OVER w AS BIGINT) AS cum_orders,
      |  ROUND(CAST(SUM(n_orders) OVER w AS DOUBLE) / t.n_total, 6) AS cum_share
      |FROM d CROSS JOIN t
      |WINDOW w AS (ORDER BY basket_size ROWS BETWEEN UNBOUNDED PRECEDING
      |  AND CURRENT ROW)
      |ORDER BY basket_size""".stripMargin

  /** Monthly revenue volatility per brand: coefficient of variation of
    * monthly revenue totals — the stability screen behind assortment and
    * forecasting decisions (a brand with CV 1.2 needs a different safety
    * stock than one at 0.1). Monthly sums go through DECIMAL; the CV runs on
    * the brand × month aggregate, bounded by catalog × calendar.
    */
  def qPriceVolatility(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(sum(AnalyticsQueries.dec(col("l_extendedprice"))).cast("double")
        .as("rev"))
    m.groupBy(col("brand"))
      .agg(count(lit(1)).as("n_months"),
        round(avg(col("rev")), 6).as("mean_rev"),
        round(stddev_samp(col("rev")), 6).as("std_rev"),
        round(stddev_samp(col("rev")) / avg(col("rev")), 6).as("cv"))
      .orderBy(col("brand"))
  }

  val priceVolatilitySql: String =
    """WITH m AS (SELECT p_brand AS brand,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2)
      |SELECT brand, COUNT(*) AS n_months, ROUND(AVG(rev), 6) AS mean_rev,
      |  ROUND(STDDEV_SAMP(rev), 6) AS std_rev,
      |  ROUND(STDDEV_SAMP(rev) / AVG(rev), 6) AS cv
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  /** User active-lifetime distribution: the span in days between each user's
    * first and last event, bucketed — the engagement-horizon histogram that
    * sets retention-window defaults. Per-user min/max is one keyed aggregate;
    * the histogram is bounded by the observation window.
    */
  def qActiveLifetime(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
        .cast("long").as("span_days"))
    val total = spans.agg(count(lit(1)).as("n_total"))
    spans.groupBy(col("span_days")).agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .select(col("span_days"), col("n_users"),
        round(col("n_users").cast("double") / col("n_total"), 6).as("share"))
      .orderBy(col("span_days"))
  }

  val activeLifetimeSql: String =
    """WITH s AS (SELECT user_id,
      |    CAST(MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) AS BIGINT)
      |      AS span_days
      |  FROM events GROUP BY 1),
      |t AS (SELECT COUNT(*) AS n_total FROM s)
      |SELECT span_days, COUNT(*) AS n_users,
      |  ROUND(CAST(COUNT(*) AS DOUBLE) / t.n_total, 6) AS share
      |FROM s CROSS JOIN t GROUP BY span_days, t.n_total
      |ORDER BY span_days""".stripMargin

  /** Quantity uplift by discount band: average line quantity at each discount
    * level vs the zero-discount baseline — the first-order price-elasticity
    * read a merchandiser pulls before any modeling. DECIMAL sums; the
    * baseline rides a broadcast 1-row aggregate.
    */
  def qDiscountUplift(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select((round(col("l_discount") * 100).cast("long")).as("disc_pct"),
        col("l_quantity"))
    val bands = l.groupBy(col("disc_pct"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(AnalyticsQueries.dec(col("l_quantity"))).cast("double") /
          count(lit(1))).as("avg_qty"))
    val base = bands.filter(col("disc_pct") === 0)
      .select(col("avg_qty").as("base_qty"))
    bands.crossJoin(broadcast(base))
      .select(col("disc_pct"), col("n_lines"),
        round(col("avg_qty"), 6).as("avg_qty"),
        round(col("avg_qty") / col("base_qty"), 6).as("uplift"))
      .orderBy(col("disc_pct"))
  }

  val discountUpliftSql: String =
    """WITH l AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
      |    l_quantity FROM lineitem),
      |b AS (SELECT disc_pct, COUNT(*) AS n_lines,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |      AS avg_qty
      |  FROM l GROUP BY 1),
      |z AS (SELECT avg_qty AS base_qty FROM b WHERE disc_pct = 0)
      |SELECT disc_pct, n_lines, ROUND(avg_qty, 6) AS avg_qty,
      |  ROUND(avg_qty / z.base_qty, 6) AS uplift
      |FROM b CROSS JOIN z ORDER BY disc_pct""".stripMargin

  /** Conversion rate by session ordinal: does the Nth session of a user's
    * life convert better than the first? Reuses the gap-sessionized stream
    * (session_id IS the ordinal — the cumulative window numbers a user's
    * sessions in time order); the rate table is bounded by max sessions per
    * user over the observation window.
    */
  def qSessionConversion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ms"))
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_type"))
    val prev = lag(col("ms"), 1).over(byUser)
    val sess = e
      .withColumn("session_id",
        sum(when(prev.isNull || col("ms") - prev > 1800000L, 1L).otherwise(0L))
          .over(byUser.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
    sess.groupBy(col("session_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"))
      .select(col("session_id"), col("n_sessions"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_sessions"), 6)
          .as("conversion_rate"))
      .orderBy(col("session_id"))
  }

  val sessionConversionSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
      |f AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
      |      OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
      |s AS (SELECT user_id, event_type,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM f),
      |g AS (SELECT user_id, session_id,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      |  FROM s GROUP BY 1, 2)
      |SELECT session_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(converted) AS BIGINT) AS n_converted,
      |  ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conversion_rate
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** Trailing-7-day volume anomalies per event type (current day scored
    * against the preceding week's mean/stddev).
    */
  def qAnomalyDaily(spark: SparkSession, dir: String): DataFrame =
    EventStats.dailyAnomalies(Tables.events(spark, dir), "ts", "event_type")
      .orderBy(col("event_type"), col("day"))

  val anomalyDailySql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, day, n_events,
      |    COUNT(n_events) OVER pw AS baseline_n,
      |    AVG(n_events) OVER pw AS baseline_mean,
      |    STDDEV_SAMP(n_events) OVER pw AS baseline_std
      |  FROM d WINDOW pw AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT *, CASE WHEN baseline_n >= 3 AND baseline_std > 0
      |    THEN (n_events - baseline_mean) / baseline_std END AS zv FROM w)
      |SELECT event_type, day, n_events,
      |  ROUND(baseline_mean, 6) AS baseline_mean,
      |  ROUND(baseline_std, 6) AS baseline_std,
      |  ROUND(zv, 6) AS z, ABS(zv) > 2.0 AS is_anomaly
      |FROM z ORDER BY event_type, day""".stripMargin

  /** Per-user inter-arrival burstiness B = (σ−μ)/(σ+μ) over event gaps. */
  def qBurstiness(spark: SparkSession, dir: String): DataFrame =
    EventStats.burstiness(Tables.events(spark, dir), "ts", "user_id")
      .orderBy(col("user_id"))

  val burstinessSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
      |g AS (SELECT user_id,
      |    ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
      |      AS gap_ms
      |  FROM e),
      |s AS (SELECT user_id, COUNT(*) + 1 AS n_events,
      |    CAST(SUM(gap_ms) AS BIGINT) AS sms, COUNT(*) AS ng,
      |    AVG(gap_ms / 1000.0) AS mu, STDDEV_SAMP(gap_ms / 1000.0) AS sigma
      |  FROM g WHERE gap_ms IS NOT NULL GROUP BY 1)
      |SELECT user_id, n_events,
      |  CAST((2 * sms * 1000000 + 1000 * ng) // (2000 * ng) AS DOUBLE)
      |    / 1e6 AS mean_gap_s,
      |  ROUND(sigma, 6) AS std_gap_s,
      |  ROUND((sigma - mu) / (sigma + mu), 6) AS burstiness
      |FROM s WHERE n_events >= 6 ORDER BY user_id""".stripMargin

  /** Shannon entropy (bits) of each user's event-type mix. */
  def qUserEntropy(spark: SparkSession, dir: String): DataFrame =
    EventStats.userTypeEntropy(Tables.events(spark, dir), "user_id", "event_type")
      .orderBy(col("user_id"))

  val userEntropySql: String =
    """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT user_id, SUM(n) AS tot, COUNT(*) AS n_types FROM c GROUP BY 1),
      |j AS (SELECT c.user_id, t.tot, t.n_types,
      |    CAST(-(c.n / CAST(t.tot AS DOUBLE))
      |      * LN(c.n / CAST(t.tot AS DOUBLE)) / 0.6931471805599453
      |      AS DECIMAL(18,8)) AS term
      |  FROM c JOIN t ON c.user_id = t.user_id)
      |SELECT user_id, CAST(MAX(tot) AS BIGINT) AS n_events, MAX(n_types) AS n_types,
      |  CAST(ROUND(SUM(term), 6) AS DOUBLE) AS entropy_bits
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** 2-core of the repeat-co-purchase graph (the peel cascades: depth 3 at
    * sf0.01, 5 at sf0.1, with a non-empty core at the correctness SF). The
    * oracle unrolls 10 peeling rounds as CTEs; peeling is IDEMPOTENT at
    * fixpoint, so unrolling more rounds than the actual depth changes
    * nothing — the PageRank fixed-iteration discipline without needing the
    * iteration counts to match exactly.
    */
  def qKcore(spark: SparkSession, dir: String): DataFrame =
    graft.ext.KCore.kCore(repeatEdges(spark, dir), "src", "dst", k = 2)
      .orderBy(col("node"))

  val kcoreSql: String = {
    val k = 2
    val rounds = 10
    // AS MATERIALIZED is load-bearing: each round references the previous
    // frame several times, and inlined CTEs would expand the lineage
    // exponentially (observed as thousands of re-opened parquet scans)
    val peels = (1 to rounds).map { i =>
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""d$i AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
         |  (SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev)
         |  GROUP BY 1),
         |p$i AS MATERIALIZED (SELECT a, b FROM $prev
         |  WHERE a IN (SELECT node FROM d$i WHERE deg >= $k)
         |  AND b IN (SELECT node FROM d$i WHERE deg >= $k))""".stripMargin
    }.mkString(",\n")
    s"""WITH $repeatEdgesSql,
       |p0 AS MATERIALIZED (SELECT a, b FROM e),
       |$peels
       |SELECT node, COUNT(*) AS deg FROM
       |  (SELECT a AS node FROM p$rounds UNION ALL SELECT b FROM p$rounds)
       |GROUP BY 1 HAVING COUNT(*) >= $k ORDER BY node""".stripMargin
  }

  // -------------------------------------------------------------------------
  // Conversion attribution
  // -------------------------------------------------------------------------

  /** First/last/linear attribution of purchases to view/click touchpoints
    * within a 7-day lookback.
    */
  def qAttribution(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Attribution.channelCredit(Tables.events(spark, dir),
        "ts", "user_id", "event_type", "event_id",
        touchTypes = Seq("view", "click"), convType = "purchase",
        lookbackMs = 7L * 24 * 3600 * 1000)
      .orderBy(col("channel"))

  val attributionSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id,
      |    event_type AS channel FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |s AS (SELECT *, SUM(CASE WHEN channel = 'purchase' THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM e),
      |seg AS (SELECT user_id, ms, event_id, channel,
      |    CASE WHEN channel = 'purchase' THEN cum - 1 ELSE cum END AS seg FROM s),
      |t AS (SELECT * FROM seg WHERE channel <> 'purchase'),
      |c AS (SELECT user_id, seg, ms AS conv_ms, event_id AS conv_id
      |      FROM seg WHERE channel = 'purchase'),
      |j AS (SELECT t.user_id, t.seg, t.ms, t.event_id, t.channel,
      |        c.conv_ms, c.conv_id
      |      FROM t JOIN c ON t.user_id = c.user_id AND t.seg = c.seg
      |      WHERE c.conv_ms - t.ms <= 604800000),
      |m AS (SELECT *,
      |    COUNT(*) OVER pc AS n_touches,
      |    FIRST_VALUE(channel) OVER po AS first_chan,
      |    LAST_VALUE(channel) OVER po AS last_chan
      |  FROM j WINDOW
      |    pc AS (PARTITION BY user_id, seg),
      |    po AS (PARTITION BY user_id, seg ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
      |lin AS (SELECT channel, SUM(CAST(1.0 / n_touches AS DECIMAL(18,8)))
      |        AS lin FROM m GROUP BY 1),
      |pc AS (SELECT DISTINCT user_id, conv_id, first_chan, last_chan FROM m),
      |f AS (SELECT first_chan AS channel, COUNT(*) AS n_first_touch FROM pc GROUP BY 1),
      |l AS (SELECT last_chan AS channel, COUNT(*) AS n_last_touch FROM pc GROUP BY 1)
      |SELECT COALESCE(f.channel, l.channel, lin.channel) AS channel,
      |  COALESCE(f.n_first_touch, 0) AS n_first_touch,
      |  COALESCE(l.n_last_touch, 0) AS n_last_touch,
      |  ROUND(CAST(COALESCE(lin.lin, CAST(0 AS DECIMAL(18,8))) AS DOUBLE), 6)
      |    AS linear_credit
      |FROM f FULL OUTER JOIN l ON f.channel = l.channel
      |FULL OUTER JOIN lin ON COALESCE(f.channel, l.channel) = lin.channel
      |ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------------
  // Counterfactual evaluation + training-data assembly
  // -------------------------------------------------------------------------

  /** Self-normalized inverse-propensity precision@10 (SNIPS): hits weighted by
    * 1/propensity so popular items can't buy precision — the standard
    * debiased offline evaluation when the logged feedback itself came from a
    * popularity-skewed policy. Propensity is Laplace-smoothed interaction
    * share `(pop_i + 1) / (total + n_items)` (smoothing keeps zero-history
    * rec items finite); per-user score = Σ(hit·w) / Σ(w) over the top-10
    * frequency-ranked recs. All weights derive from exact integers, so both
    * engines compute identical doubles; per-user sums go through DECIMAL.
    */
  def qIpsPrecision(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = sales(spark, dir).select(col("user_id"), col("item_id"))
    val pop = a.groupBy(col("item_id")).agg(count(lit(1)).as("pop_n"))
    val totals = a.agg(count(lit(1)).as("total"),
      countDistinct(col("item_id")).as("n_items"))
    val rc = recommendations(spark, dir)
      .groupBy(col("user_id"), col("item_id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("n").desc, col("item_id"))
    val topk = rc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
    val hits = a.distinct().withColumn("hit", lit(1L))
    topk
      .join(hits, Seq("user_id", "item_id"), "left")
      .join(pop, Seq("item_id"), "left")
      .crossJoin(broadcast(totals))
      // micro-units: the IPS weight is quantized to an INTEGER number of
      // 1e-6 units — integer sums are engine-exact, and the single final
      // double division of two BIGINTs is IEEE-identical everywhere. (The
      // earlier per-row double→DECIMAL(18,8) cast diverged sub-ulp between
      // engines at sf0.1 — caught by the scale-tier oracle gate.)
      .withColumn("wgt",
        round((col("total") + col("n_items")).cast("double") * 1000000.0 /
          (coalesce(col("pop_n"), lit(0L)) + 1)).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_topk"),
        sum(when(col("hit") === 1, col("wgt")).otherwise(0L)).as("num"),
        sum(col("wgt")).as("den"))
      .select(col("user_id"), col("n_topk"),
        round(col("num").cast("double") / col("den"), 6).as("snips"))
      .orderBy(col("user_id"))
  }

  val ipsPrecisionSql: String =
    s"""WITH $salesSql,
      |$recsSql,
      |pop AS (SELECT item_id, COUNT(*) AS pop_n FROM sales GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS total, COUNT(DISTINCT item_id) AS n_items
      |        FROM sales),
      |rc AS (SELECT user_id, item_id, COUNT(*) AS n FROM recs GROUP BY 1, 2),
      |topk AS (SELECT * FROM (SELECT user_id, item_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, item_id)
      |      AS rnk FROM rc) WHERE rnk <= 10),
      |h AS (SELECT DISTINCT user_id, item_id, 1 AS hit FROM sales),
      |t AS (SELECT k.user_id,
      |    CAST(ROUND((tot.total + tot.n_items) * 1000000.0
      |      / (COALESCE(pop.pop_n, 0) + 1)) AS BIGINT) AS wgt,
      |    COALESCE(h.hit, 0) AS hit
      |  FROM topk k
      |  LEFT JOIN h ON k.user_id = h.user_id AND k.item_id = h.item_id
      |  LEFT JOIN pop ON k.item_id = pop.item_id
      |  CROSS JOIN tot)
      |SELECT user_id, COUNT(*) AS n_topk,
      |  ROUND(SUM(CASE WHEN hit = 1 THEN wgt ELSE 0 END) * 1.0 / SUM(wgt), 6)
      |    AS snips
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** Deterministic negative sampling: for each user with purchase history,
    * 5 items drawn from the 200 most-popular catalog items the user has NOT
    * interacted with — the contrastive-training counterpart of the positive
    * pairs. Popularity-proposal negatives (not uniform) are the standard
    * hard-negative heuristic, and the md5 pick order makes every engine and
    * every rerun draw the same rows (the dataset-split discipline).
    */
  def qNegativeSamples(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the distinct interaction table feeds three differently-keyed branches
    // (popularity top-200, the user roster, the history anti-join) — one
    // materialization instead of three sales-join re-runs (17 scans observed)
    val a = sales(spark, dir).select(col("user_id"), col("item_id")).distinct()
      .localCheckpoint(eager = true)
    val popTop = a.groupBy(col("item_id")).agg(count(lit(1)).as("pop_n"))
      .orderBy(col("pop_n").desc, col("item_id")).limit(200)
      .select(col("item_id"))
    val users = a.select(col("user_id")).distinct()
    // pick = 52-bit md5 prefix as a NUMBER (exact in a double, same value in
    // both engines via the conv ⇔ ('0x'||…)::BIGINT identity) so the draw can
    // run through the bounded-heap TopKAggregator instead of a row_number
    // window: the window shuffles all #users × 200 candidate rows to sort
    // them; the aggregator's map-side partial heaps forward ≤ 5 rows per user
    // — the q_simsearch_batch shape applied to sampling. Ties (52-bit
    // collisions) break by ascending item_id in BOTH engines.
    // the anti-join only ever needs history rows whose item is in the top-200
    // candidate set — semi-restricting `a` first shrinks the build side from
    // the full interaction table to the top-item histories, small enough to
    // broadcast, so the #users × 200 candidate stream never shuffles: it flows
    // map-side from the crossJoin straight into the partial heaps. (The
    // broadcast bound is Σ_top-items |users(item)|; if that outgrows the
    // driver at extreme scale, drop the hint and AQE's runtime conversion
    // keeps the same join with a local shuffle read instead.)
    val topHistory = a.join(broadcast(popTop), Seq("item_id"), "left_semi")
    val cand = users.crossJoin(broadcast(popTop))
      .join(broadcast(topHistory), Seq("user_id", "item_id"), "left_anti")
      // fused 52-bit pick ([[graft.functions.Md5Pick52]]): same bytes, same
      // digest as conv(substring(md5(concat(u,':',i)),1,13),16,10), minus
      // the per-candidate string concat / hex string / parse allocations
      .withColumn("pick",
        graft.functions.Md5Pick52.md5Pick52(col("user_id"), col("item_id")))
    val topk = udaf(new graft.functions.TopKAggregator(5))
    cand.groupBy(col("user_id"))
      .agg(topk(col("item_id"), (-col("pick")).cast("double")).as("__r"))
      .select(col("user_id"), posexplode(col("__r.items")))
      .select(col("user_id"), col("col.id").as("item_id"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("user_id"), col("rnk"))
  }

  val negativeSamplesSql: String =
    s"""WITH $salesSql,
      |a AS (SELECT DISTINCT user_id, item_id FROM sales),
      |pt AS (SELECT item_id FROM a GROUP BY item_id
      |       ORDER BY COUNT(*) DESC, item_id LIMIT 200),
      |u AS (SELECT DISTINCT user_id FROM a),
      |cand AS (SELECT u.user_id, pt.item_id,
      |    ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':' ||
      |      CAST(pt.item_id AS VARCHAR)), 1, 13))::BIGINT AS pick
      |  FROM u CROSS JOIN pt
      |  WHERE NOT EXISTS (SELECT 1 FROM a
      |    WHERE a.user_id = u.user_id AND a.item_id = pt.item_id)),
      |rk AS (SELECT user_id, item_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pick, item_id)
      |      AS rnk FROM cand)
      |SELECT user_id, item_id, rnk FROM rk WHERE rnk <= 5
      |ORDER BY user_id, rnk""".stripMargin

  /** Referential-integrity audit across the warehouse's FK chains — the
    * data-quality gate a pipeline runs on every drop (generated data is
    * clean, so the sf oracle run is a zero-orphans regression check; the
    * orphan-detection logic itself is fixture-tested in
    * InsightQueriesSpec, the q_customers_no_orders precedent).
    */
  def qFkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    // ONE pass per child: LEFT join against the parent's DISTINCT keys
    // (exact even if a parent key were ever duplicated) and count rows +
    // unmatched rows in the same aggregate. The previous shape scanned
    // every child twice (anti join for orphans + a separate total count)
    // and crossJoined the two 1-row aggregates — 14 child scans for 7
    // relations; this is 7.
    def audit(child: DataFrame, childKey: String, parent: DataFrame,
              parentKey: String, relation: String): DataFrame =
      child.select(col(childKey))
        .join(parent.select(col(parentKey)).distinct(),
          col(childKey) === col(parentKey), "left")
        .agg(count(lit(1)).as("n_child"),
          count(when(col(parentKey).isNull, 1)).as("n_orphans"))
        .select(lit(relation).as("relation"), col("n_child"), col("n_orphans"))
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    Seq(
      audit(l, "l_orderkey", o, "o_orderkey", "lineitem->orders"),
      audit(l, "l_partkey", Tables.part(spark, dir), "p_partkey", "lineitem->part"),
      audit(l, "l_suppkey", s, "s_suppkey", "lineitem->supplier"),
      audit(o, "o_custkey", c, "c_custkey", "orders->customer"),
      audit(c, "c_nationkey", n, "n_nationkey", "customer->nation"),
      audit(s, "s_nationkey", n, "n_nationkey", "supplier->nation"),
      audit(n, "n_regionkey", r, "r_regionkey", "nation->region")
    ).reduce(_ unionAll _).orderBy(col("relation"))
  }

  val fkIntegritySql: String = {
    val rels = Seq(
      ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"))
    rels.map { case (rel, ct, ck, pt, pk) =>
      // NULL-safe orphan predicate: the engine's left join counts a NULL
      // child key as an orphan (it can never match a parent); plain NOT IN
      // would silently exclude it (NULL NOT IN ... is NULL), and a NULL
      // parent key would nuke the whole NOT IN — filter both explicitly
      s"""SELECT '$rel' AS relation,
         |  (SELECT COUNT(*) FROM $ct) AS n_child,
         |  (SELECT COUNT(*) FROM $ct WHERE $ck IS NULL OR $ck NOT IN
         |    (SELECT $pk FROM $pt WHERE $pk IS NOT NULL)) AS n_orphans""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  // -------------------------------------------------------------------------
  // Clustering quality, popularity bias, graph drift
  // -------------------------------------------------------------------------

  /** Simplified silhouette of the seed-centroid clustering over the embedding
    * corpus — the measurable form of SemDeDup's "raise k or sub-cluster"
    * decision.
    */
  def qSilhouette(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Clustering.simplifiedSilhouette(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        ExtQueries.seedCentroids(spark, dir), "cid", "cvec")
      .orderBy(col("centroid_id"))

  val silhouetteSql: String =
    s"""WITH ${ExtQueries.centroidAssignCtes},
      |b1 AS (SELECT vec_id, cid, 1 - cos AS a FROM r WHERE rk = 1),
      |b2 AS (SELECT vec_id, 1 - cos AS b FROM r WHERE rk = 2),
      |sil AS (SELECT b1.cid,
      |    CAST(CASE WHEN GREATEST(a, b) = 0 THEN 0
      |      ELSE (b - a) / GREATEST(a, b) END AS DECIMAL(18,8)) AS s
      |  FROM b1 JOIN b2 ON b1.vec_id = b2.vec_id)
      |SELECT cid AS centroid_id, COUNT(*) AS n_vectors,
      |  ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
      |FROM sil GROUP BY 1 ORDER BY 1""".stripMargin

  /** Average recommendation popularity (ARP) per user — the popularity-bias
    * gauge: high ARP with low [[qSerendipity]] means the recommender re-serves
    * blockbusters. Popularity = the item's interaction count in sales; items
    * never sold count 0.
    */
  def qPopBias(spark: SparkSession, dir: String): DataFrame = {
    val pop = sales(spark, dir)
      .groupBy(col("item_id")).agg(count(lit(1)).as("pop_n"))
    val r = recommendations(spark, dir)
      .select(col("user_id"), col("item_id")).distinct()
    r.join(pop, Seq("item_id"), "left")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_recs"),
        round(sum(coalesce(col("pop_n"), lit(0L))).cast("double") /
          count(lit(1)), 6).as("arp"))
      .orderBy(col("user_id"))
  }

  val popBiasSql: String =
    s"""WITH $salesSql,
      |$recsSql,
      |pop AS (SELECT item_id, COUNT(*) AS pop_n FROM sales GROUP BY 1),
      |r AS (SELECT DISTINCT user_id, item_id FROM recs)
      |SELECT r.user_id, COUNT(*) AS n_recs,
      |  ROUND(CAST(SUM(COALESCE(pop.pop_n, 0)) AS BIGINT) * 1.0 / COUNT(*), 6)
      |    AS arp
      |FROM r LEFT JOIN pop ON r.item_id = pop.item_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Year-over-year drift of the co-purchase graph: Jaccard of consecutive
    * years' edge sets — the retraining-cadence signal (a high-drift catalog
    * invalidates item-item models faster).
    */
  def qGraphDrift(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ok"), year(col("o_orderdate")).as("y"))
    val ey = l.as("x").join(l.as("y"), col("x.ok") === col("y.ok") &&
        col("x.pk") < col("y.pk"))
      .select(col("x.ok").as("ok"), col("x.pk").as("a"), col("y.pk").as("b"))
      .join(o, Seq("ok"))
      .select(col("y"), col("a"), col("b")).distinct()
    val ny = ey.groupBy(col("y")).agg(count(lit(1)).as("n_edges"))
    val common = ey.as("p").join(ey.as("q"),
        col("p.a") === col("q.a") && col("p.b") === col("q.b") &&
          col("q.y") === col("p.y") + 1)
      .groupBy(col("p.y").as("y"))
      .agg(count(lit(1)).as("n_common"))
    ny.as("na").join(ny.as("nb"), col("nb.y") === col("na.y") + 1)
      .select(col("na.y").as("year_a"), col("nb.y").as("year_b"),
        col("na.n_edges").as("n_a"), col("nb.n_edges").as("n_b"))
      .join(common.withColumnRenamed("y", "year_a"), Seq("year_a"), "left")
      .select(col("year_a"), col("year_b"), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 6))
      .orderBy(col("year_a"))
  }

  val graphDriftSql: String =
    """WITH e AS (SELECT DISTINCT year(o.o_orderdate) AS y,
      |    x.l_partkey AS a, y2.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y2
      |  ON x.l_orderkey = y2.l_orderkey AND x.l_partkey < y2.l_partkey
      |  JOIN orders o ON x.l_orderkey = o.o_orderkey),
      |ny AS (SELECT y, COUNT(*) AS n_edges FROM e GROUP BY 1),
      |cm AS (SELECT p.y, COUNT(*) AS n_common
      |  FROM e p JOIN e q ON p.a = q.a AND p.b = q.b AND q.y = p.y + 1
      |  GROUP BY 1)
      |SELECT na.y AS year_a, nb.y AS year_b, na.n_edges AS n_a,
      |  nb.n_edges AS n_b, COALESCE(cm.n_common, 0) AS n_common,
      |  ROUND(COALESCE(cm.n_common, 0) * 1.0
      |    / (na.n_edges + nb.n_edges - COALESCE(cm.n_common, 0)), 6) AS jaccard
      |FROM ny na JOIN ny nb ON nb.y = na.y + 1
      |LEFT JOIN cm ON cm.y = na.y
      |ORDER BY year_a""".stripMargin

  // -------------------------------------------------------------------------
  // Robust outliers
  // -------------------------------------------------------------------------

  /** Median/MAD modified-z outliers over event values (threshold 3.5) —
    * o_totalprice was the first candidate but its spread is too uniform to
    * flag anything (max |z| ≈ 1.4 at sf0.01), which would make the oracle
    * pass vacuous; the long-tailed events.value column genuinely trips the
    * 3.5 cut.
    */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame =
    Profiling.madOutliers(Tables.events(spark, dir), "event_id", "value")
      .orderBy(abs(col("robust_z")).desc, col("id"))

  val madOutliersSql: String =
    """WITH x AS (SELECT event_id AS id, CAST(value AS DOUBLE) AS value
      |  FROM events),
      |m AS (SELECT QUANTILE_CONT(value, 0.5) AS median_value FROM x),
      |md AS (SELECT QUANTILE_CONT(ABS(value - m.median_value), 0.5) AS mad
      |       FROM x CROSS JOIN m),
      |z AS (SELECT id, value, m.median_value, md.mad,
      |    0.6745 * (value - m.median_value) / md.mad AS rz
      |  FROM x CROSS JOIN m CROSS JOIN md)
      |SELECT id, value, ROUND(median_value, 6) AS median_value,
      |  ROUND(mad, 6) AS mad, ROUND(rz, 6) AS robust_z
      |FROM z WHERE ABS(rz) > 3.5 ORDER BY ABS(ROUND(rz, 6)) DESC, id""".stripMargin

  // -------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_map_at_k" -> (qMapAtK _),
    "q_hit_rate" -> (qHitRate _),
    "q_serendipity" -> (qSerendipity _),
    "q_calibration" -> (qCalibration _),
    "q_item_cf" -> (qItemCf _),
    "q_triangles" -> (qTriangles _),
    "q_assortativity" -> (qAssortativity _),
    "q_bfs_levels" -> (qBfsLevels _),
    "q_anomaly_daily" -> (qAnomalyDaily _),
    "q_burstiness" -> (qBurstiness _),
    "q_user_entropy" -> (qUserEntropy _),
    "q_kcore" -> (qKcore _),
    "q_silhouette" -> (qSilhouette _),
    "q_pop_bias" -> (qPopBias _),
    "q_graph_drift" -> (qGraphDrift _),
    "q_attribution" -> (qAttribution _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_ips_precision" -> (qIpsPrecision _),
    "q_negative_samples" -> (qNegativeSamples _),
    "q_fk_integrity" -> (qFkIntegrity _),
    "q_two_hop_recs" -> (qTwoHopRecs _),
    "q_split_leakage" -> (qSplitLeakage _),
    "q_survival" -> (qSurvival _),
    "q_top_paths" -> (qTopPaths _),
    "q_rolling_dau" -> (qRollingDau _),
    "q_copurchase_cc" -> (qCopurchaseCc _),
    "q_seasonal_baseline" -> (qSeasonalBaseline _),
    "q_churn_labels" -> (qChurnLabels _),
    "q_trimmed_mean" -> (qTrimmedMean _),
    "q_funnel_latency" -> (qFunnelLatency _),
    "q_theil_sen" -> (qTheilSen _),
    "q_ship_latency" -> (qShipLatency _),
    "q_return_rate_ci" -> (qReturnRateCi _),
    "q_basket_size_dist" -> (qBasketSizeDist _),
    "q_price_volatility" -> (qPriceVolatility _),
    "q_active_lifetime" -> (qActiveLifetime _),
    "q_discount_uplift" -> (qDiscountUplift _),
    "q_session_conversion" -> (qSessionConversion _)
  )

  val oracleSql: Map[String, String] = Map(
    "q_map_at_k" -> mapAtKSql,
    "q_hit_rate" -> hitRateSql,
    "q_serendipity" -> serendipitySql,
    "q_calibration" -> calibrationSql,
    "q_item_cf" -> itemCfSql,
    "q_triangles" -> trianglesSql,
    "q_assortativity" -> assortativitySql,
    "q_bfs_levels" -> bfsLevelsSql,
    "q_anomaly_daily" -> anomalyDailySql,
    "q_burstiness" -> burstinessSql,
    "q_user_entropy" -> userEntropySql,
    "q_kcore" -> kcoreSql,
    "q_silhouette" -> silhouetteSql,
    "q_pop_bias" -> popBiasSql,
    "q_graph_drift" -> graphDriftSql,
    "q_attribution" -> attributionSql,
    "q_mad_outliers" -> madOutliersSql,
    "q_ips_precision" -> ipsPrecisionSql,
    "q_negative_samples" -> negativeSamplesSql,
    "q_fk_integrity" -> fkIntegritySql,
    "q_two_hop_recs" -> twoHopRecsSql,
    "q_split_leakage" -> splitLeakageSql,
    "q_survival" -> survivalSql,
    "q_top_paths" -> topPathsSql,
    "q_rolling_dau" -> rollingDauSql,
    "q_copurchase_cc" -> copurchaseCcSql,
    "q_seasonal_baseline" -> seasonalBaselineSql,
    "q_churn_labels" -> churnLabelsSql,
    "q_trimmed_mean" -> trimmedMeanSql,
    "q_funnel_latency" -> funnelLatencySql,
    "q_theil_sen" -> theilSenSql,
    "q_ship_latency" -> shipLatencySql,
    "q_return_rate_ci" -> returnRateCiSql,
    "q_basket_size_dist" -> basketSizeDistSql,
    "q_price_volatility" -> priceVolatilitySql,
    "q_active_lifetime" -> activeLifetimeSql,
    "q_discount_uplift" -> discountUpliftSql,
    "q_session_conversion" -> sessionConversionSql
  )
}
