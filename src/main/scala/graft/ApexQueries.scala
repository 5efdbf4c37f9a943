package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Contingency, Periodogram, Profiling, RankCorr, RatioMetric,
  Sketches, TextStats}

/** Round-8 batch #5: rank correlation (Spearman), categorical association
  * (chi-square + Cramér's V), clustered ratio-metric inference (delta
  * method), trig-free spectral analysis (ANOVA periodogram), tokenizer
  * budgeting (vocabulary-coverage/OOV curve), ingestion health (source
  * freshness), and sketch-based frequency estimation (Count-Min audit).
  * Every oracle mirrors the Spark arithmetic shape — exact integer/DECIMAL
  * moments, one fixed-order double formula — so results hash-match at both
  * correctness tiers.
  */
object ApexQueries {

  // --------------------------------------------------------------------------
  // Spearman rank correlation
  // --------------------------------------------------------------------------

  /** Spearman's ρ between order quantity and line revenue base
    * ([[RankCorr.spearman]]): extendedprice = qty × unit price, so the
    * monotone association is strong but not perfect (unit prices vary per
    * part) — a value Pearson underestimates whenever the relation is
    * monotone-nonlinear.
    */
  def qSpearman(spark: SparkSession, dir: String): DataFrame =
    RankCorr.spearman(Tables.lineitem(spark, dir), "l_quantity", "l_extendedprice")
      .select(col("n"), round(col("spearman_rho"), 6).as("spearman_rho"))

  val spearmanSql: String =
    """WITH t AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |vx AS (SELECT x AS v, COUNT(*) AS c FROM t GROUP BY 1),
      |rx AS (SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2
      |  FROM vx),
      |vy AS (SELECT y AS v, COUNT(*) AS c FROM t GROUP BY 1),
      |ry AS (SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2
      |  FROM vy),
      |p AS (SELECT rx.r2 AS rxv, ry.r2 AS ryv FROM t
      |  JOIN rx ON t.x = rx.v JOIN ry ON t.y = ry.v),
      |m AS (SELECT COUNT(*) AS n, SUM(rxv) AS sx, SUM(ryv) AS sy,
      |    SUM(rxv * ryv) AS sxy, SUM(rxv * rxv) AS sxx, SUM(ryv * ryv) AS syy
      |  FROM p)
      |SELECT n, ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
      |         CAST(n * syy - sy * sy AS DOUBLE)), 6) AS spearman_rho
      |FROM m""".stripMargin

  // --------------------------------------------------------------------------
  // Chi-square independence + Cramér's V
  // --------------------------------------------------------------------------

  /** Is return behavior independent of brand? χ² test + Cramér's V over the
    * p_brand × l_returnflag contingency table
    * ([[Contingency.chiSquareCramersV]]).
    */
  def qCramersV(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
    Contingency.chiSquareCramersV(src, "p_brand", "l_returnflag")
      .select(col("n"), col("r_levels"), col("c_levels"), col("dof"),
        round(col("chi2"), 6).as("chi2"),
        round(col("cramers_v"), 6).as("cramers_v"))
  }

  val cramersVSql: String =
    """WITH src AS (SELECT p_brand AS a, l_returnflag AS b FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand IS NOT NULL AND l_returnflag IS NOT NULL),
      |cells AS (SELECT a, b, COUNT(*) AS o FROM src GROUP BY 1, 2),
      |rm AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
      |cm AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
      |tot AS (SELECT SUM(o) AS nn, COUNT(DISTINCT a) AS r_levels,
      |    COUNT(DISTINCT b) AS c_levels FROM cells),
      |grid AS (SELECT rm.a, cm.b, rm.ra, cm.cb, COALESCE(cells.o, 0) AS o
      |  FROM rm CROSS JOIN cm
      |  LEFT JOIN cells ON rm.a = cells.a AND cm.b = cells.b),
      |d AS (SELECT CAST(CAST(o AS DECIMAL(19,0)) * CAST(nn AS DECIMAL(19,0)) -
      |      CAST(ra AS DECIMAL(19,0)) * CAST(cb AS DECIMAL(19,0)) AS DOUBLE)
      |      AS dn,
      |    (CAST(nn AS DOUBLE) * CAST(ra AS DOUBLE)) * CAST(cb AS DOUBLE) AS dd,
      |    nn, r_levels, c_levels
      |  FROM grid CROSS JOIN tot),
      |s AS (SELECT nn, r_levels, c_levels,
      |    SUM(CAST((dn * dn) / dd AS DECIMAL(28,12))) AS chi2d
      |  FROM d GROUP BY 1, 2, 3)
      |SELECT CAST(nn AS BIGINT) AS n, r_levels, c_levels,
      |  (r_levels - 1) * (c_levels - 1) AS dof,
      |  ROUND(CAST(chi2d AS DOUBLE), 6) AS chi2,
      |  ROUND(sqrt(CAST(chi2d AS DOUBLE) / (CAST(nn AS DOUBLE) *
      |    CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))), 6) AS cramers_v
      |FROM s""".stripMargin

  // --------------------------------------------------------------------------
  // Delta-method ratio metric
  // --------------------------------------------------------------------------

  /** Mean order value per market segment with CUSTOMER-clustered delta-method
    * standard errors ([[RatioMetric.deltaMethodRatio]]): x = order total in
    * 1e-4 dollars (exact DECIMAL), y = order count, clusters = customers —
    * the correct SE when customers, not orders, are the independent unit.
    */
  def qDeltaMethod(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
    RatioMetric.deltaMethodRatio(src, "c_mktsegment", "o_custkey",
        xCents = col("o_totalprice").cast("decimal(18,4)") * lit(10000),
        yCount = lit(1L))
      .select(col("c_mktsegment"), col("n_clusters"), col("sum_x"), col("sum_y"),
        // report in dollars: the 1e-4-dollar ratio is ~2.4e9, where a 6-decimal
        // grid sits BELOW double ulp (4.8e-7) and cross-engine ROUND ties are
        // guaranteed; at ~2.4e5 dollars ulp is 2.9e-11 — no boundary risk
        round(col("ratio") / 10000.0, 6).as("ratio"),
        round(col("se") / 10000.0, 6).as("se"),
        round(col("ci_lo") / 10000.0, 6).as("ci_lo"),
        round(col("ci_hi") / 10000.0, 6).as("ci_hi"))
      .orderBy(col("c_mktsegment"))
  }

  val deltaMethodSql: String =
    """WITH cl AS (SELECT c_mktsegment, o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)) * 10000)
      |      AS DECIMAL(19,0)) AS x,
      |    CAST(COUNT(*) AS DECIMAL(19,0)) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |m AS (SELECT c_mktsegment, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM cl GROUP BY 1),
      |f AS (SELECT c_mktsegment, n, sx, sy,
      |    CAST(n AS DOUBLE) AS nd,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xb,
      |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS yb,
      |    CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
      |    CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
      |    CAST(syy AS DOUBLE) AS syyd
      |  FROM m WHERE n > 1),
      |g AS (SELECT c_mktsegment, n, sx, sy, nd, yb, r,
      |    (sxxd - nd * (xb * xb)) / (nd - 1) AS vx,
      |    (syyd - nd * (yb * yb)) / (nd - 1) AS vy,
      |    (sxyd - nd * (xb * yb)) / (nd - 1) AS cxy
      |  FROM f),
      |h AS (SELECT c_mktsegment, n, sx, sy, r,
      |    sqrt((vx - (2.0 * r) * cxy + (r * r) * vy) / (nd * (yb * yb))) AS se
      |  FROM g)
      |SELECT c_mktsegment, n AS n_clusters,
      |  CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
      |  ROUND(r / 10000.0, 6) AS ratio, ROUND(se / 10000.0, 6) AS se,
      |  ROUND((r - 1.959963984540054 * se) / 10000.0, 6) AS ci_lo,
      |  ROUND((r + 1.959963984540054 * se) / 10000.0, 6) AS ci_hi
      |FROM h ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------------------------
  // ANOVA periodogram
  // --------------------------------------------------------------------------

  /** Trig-free periodogram of daily event value: variance explained by phase
    * folding at periods 2..14 ([[Periodogram.anovaPeriodogram]]) — a weekly
    * cycle peaks at p=7 and echoes at 14.
    */
  def qPeriodogram(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)") * lit(1000000))
        .cast("decimal(19,0)").as("x_micro"))
    Periodogram.anovaPeriodogram(daily, "day", "x_micro", 2, 14)
      .select(col("period"), col("n_days"), round(col("r2"), 6).as("r2"))
  }

  val periodogramSql: String =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS DECIMAL(19,0))
      |      AS x
      |  FROM events GROUP BY 1),
      |d0 AS (SELECT MIN(day) AS mind FROM daily),
      |t AS (SELECT datediff('day', mind, day) AS t, x FROM daily CROSS JOIN d0),
      |tot AS (SELECT COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS sxx FROM t),
      |folded AS (SELECT p.period, t.t % p.period AS phase,
      |    COUNT(*) AS n_ph, SUM(x) AS s_ph
      |  FROM t CROSS JOIN (SELECT unnest(generate_series(2, 14)) AS period) p
      |  GROUP BY 1, 2),
      |terms AS (SELECT period,
      |    CAST(CAST(s_ph * s_ph AS DOUBLE) / CAST(n_ph AS DOUBLE)
      |      AS DECIMAL(38,6)) AS term
      |  FROM folded),
      |ssb AS (SELECT period, SUM(term) AS sum_term FROM terms GROUP BY 1)
      |SELECT period, n AS n_days,
      |  ROUND((CAST(sum_term AS DOUBLE) -
      |      CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) /
      |    (CAST(sxx AS DOUBLE) - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)),
      |    6) AS r2
      |FROM ssb CROSS JOIN tot ORDER BY period""".stripMargin

  // --------------------------------------------------------------------------
  // Vocabulary coverage / OOV curve
  // --------------------------------------------------------------------------

  /** Occurrence-coverage of the top-V token vocabulary for
    * V ∈ {100, 500, 1000, 2000, 5000} ([[TextStats.vocabCoverage]]). */
  def qOovRate(spark: SparkSession, dir: String): DataFrame =
    TextStats.vocabCoverage(Tables.documents(spark, dir), "text",
      Seq(100, 500, 1000, 2000, 5000))

  val oovRateSql: String =
    """WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |tc AS (SELECT tok, COUNT(*) AS cnt FROM toks
      |  WHERE len(tok) > 0 GROUP BY 1),
      |r AS (SELECT cnt,
      |    ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rn FROM tc),
      |v AS (SELECT unnest([100, 500, 1000, 2000, 5000]) AS vocab_size),
      |agg AS (SELECT vocab_size,
      |    SUM(CASE WHEN rn <= vocab_size THEN cnt ELSE 0 END)
      |      AS covered_occurrences,
      |    SUM(cnt) AS total_occurrences
      |  FROM v CROSS JOIN r GROUP BY 1)
      |SELECT vocab_size, CAST(covered_occurrences AS BIGINT) AS covered_occurrences,
      |  CAST(total_occurrences AS BIGINT) AS total_occurrences,
      |  ROUND(CAST(covered_occurrences AS DOUBLE) / total_occurrences, 6)
      |    AS coverage,
      |  ROUND(1.0 - CAST(covered_occurrences AS DOUBLE) / total_occurrences, 6)
      |    AS oov_rate
      |FROM agg ORDER BY vocab_size""".stripMargin

  // --------------------------------------------------------------------------
  // Source freshness
  // --------------------------------------------------------------------------

  /** Per-event-type last-seen audit with 1-hour staleness flag
    * ([[Profiling.freshness]]). */
  def qFreshness(spark: SparkSession, dir: String): DataFrame =
    Profiling.freshness(Tables.events(spark, dir), "event_type", "ts", 3600L)

  val freshnessSql: String =
    """WITH per AS (SELECT event_type AS source, COUNT(*) AS n_events,
      |    MAX(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
      |      AS last_seen_epoch
      |  FROM events GROUP BY 1),
      |g AS (SELECT MAX(last_seen_epoch) AS gmax FROM per)
      |SELECT source, n_events, last_seen_epoch,
      |  gmax - last_seen_epoch AS staleness_sec,
      |  gmax - last_seen_epoch > 3600 AS is_stale
      |FROM per CROSS JOIN g ORDER BY source""".stripMargin

  // --------------------------------------------------------------------------
  // Count-Min sketch audit
  // --------------------------------------------------------------------------

  /** CMS (d=4, w=256) point-frequency audit for the true top-10 parts by
    * line count ([[Sketches.countMinTopKAudit]]) — estimates can only
    * overestimate; the audit quantifies by how much at this sketch size.
    */
  def qCmsSketch(spark: SparkSession, dir: String): DataFrame =
    Sketches.countMinTopKAudit(Tables.lineitem(spark, dir), "l_partkey",
      k = 10, depth = 4, width = 256)

  val cmsSketchSql: String =
    """WITH counts AS (SELECT l_partkey AS item, COUNT(*) AS true_cnt
      |  FROM lineitem GROUP BY 1),
      |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
      |b AS (SELECT j,
      |    CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
      |      CAST(item AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS bucket,
      |    true_cnt AS cnt
      |  FROM counts CROSS JOIN js),
      |sketch AS (SELECT j, bucket, SUM(cnt) AS bucket_cnt FROM b GROUP BY 1, 2),
      |top AS (SELECT item, true_cnt FROM counts
      |  ORDER BY true_cnt DESC, item LIMIT 10),
      |probes AS (SELECT j, item, true_cnt,
      |    CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
      |      CAST(item AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS bucket
      |  FROM top CROSS JOIN js)
      |SELECT item, true_cnt,
      |  CAST(MIN(bucket_cnt) AS BIGINT) AS cms_estimate,
      |  CAST(MIN(bucket_cnt) - true_cnt AS BIGINT) AS overestimate
      |FROM probes JOIN sketch USING (j, bucket)
      |GROUP BY item, true_cnt
      |ORDER BY true_cnt DESC, item""".stripMargin

  // --------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_spearman" -> (qSpearman _),
    "q_cramers_v" -> (qCramersV _),
    "q_delta_method" -> (qDeltaMethod _),
    "q_periodogram" -> (qPeriodogram _),
    "q_oov_rate" -> (qOovRate _),
    "q_freshness" -> (qFreshness _),
    "q_cms_sketch" -> (qCmsSketch _))

  val oracleSql: Map[String, String] = Map(
    "q_spearman" -> spearmanSql,
    "q_cramers_v" -> cramersVSql,
    "q_delta_method" -> deltaMethodSql,
    "q_periodogram" -> periodogramSql,
    "q_oov_rate" -> oovRateSql,
    "q_freshness" -> freshnessSql,
    "q_cms_sketch" -> cmsSketchSql)
}
