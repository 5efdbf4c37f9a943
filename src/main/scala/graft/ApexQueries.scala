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
  // Portable HyperLogLog audit
  // --------------------------------------------------------------------------

  /** md5-portable HLL (b=6, m=64) distinct-part estimate vs the exact count
    * ([[Sketches.hyperLogLogAudit]]) — the oracle replays the sketch
    * register-for-register, which Spark's built-in HLL++ can never offer.
    */
  def qHllEstimate(spark: SparkSession, dir: String): DataFrame =
    Sketches.hyperLogLogAudit(Tables.lineitem(spark, dir), "l_partkey", b = 6)
      .select(col("m"), col("v_empty"),
        round(col("hll_estimate"), 6).as("hll_estimate"),
        col("true_distinct"), round(col("rel_err_pct"), 6).as("rel_err_pct"))

  val hllEstimateSql: String =
    """WITH h AS (SELECT CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
      |    1, 8)) AS BIGINT) AS h FROM lineitem),
      |hw AS (SELECT h % 64 AS idx, h // 64 AS w FROM h),
      |r AS (SELECT idx, MAX(CASE WHEN w = 0 THEN 27
      |    ELSE 27 - len(bin(w)) END) AS mreg FROM hw GROUP BY 1),
      |spine AS (SELECT unnest(generate_series(0, 63)) AS idx),
      |fl AS (SELECT spine.idx, COALESCE(mreg, 0) AS mreg
      |  FROM spine LEFT JOIN r USING (idx)),
      |z AS (SELECT SUM(power(2.0, -CAST(mreg AS DOUBLE))) AS zsum,
      |    CAST(SUM(CASE WHEN mreg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty
      |  FROM fl),
      |ex AS (SELECT COUNT(DISTINCT l_partkey) AS true_distinct FROM lineitem),
      |e AS (SELECT v_empty, true_distinct,
      |    0.709 * (64.0 * 64.0) / zsum AS raw FROM z CROSS JOIN ex),
      |f AS (SELECT v_empty, true_distinct,
      |    CASE WHEN raw <= 160.0 AND v_empty > 0
      |      THEN 64.0 * ln(64.0 / CAST(v_empty AS DOUBLE)) ELSE raw END AS est
      |  FROM e)
      |SELECT 64 AS m, v_empty, ROUND(est, 6) AS hll_estimate, true_distinct,
      |  ROUND(100.0 * abs(est - CAST(true_distinct AS DOUBLE)) /
      |    CAST(true_distinct AS DOUBLE), 6) AS rel_err_pct
      |FROM f""".stripMargin

  // --------------------------------------------------------------------------
  // Welch's t-test
  // --------------------------------------------------------------------------

  /** Welch's unequal-variance t over per-user purchase revenue, arms from
    * the deterministic md5 bucket ([[graft.ext.Experiment.welchTTest]]) —
    * the continuous-metric companion of q_ab_test's two-proportion z.
    */
  def qWelchTtest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("arm",
        when(graft.ext.Splits.hashBucket(col("user_id")) % 2 === 0, lit("A"))
          .otherwise(lit("B")))
    graft.ext.Experiment.welchTTest(ev, "arm", "user_id",
        xExact = col("value").cast("decimal(18,6)") * lit(1000000),
        armA = "A", armB = "B")
      .select(col("n_a"), col("n_b"),
        round(col("mean_a") / 1000000.0, 6).as("mean_a"),
        round(col("mean_b") / 1000000.0, 6).as("mean_b"),
        round(col("t_stat"), 6).as("t_stat"),
        round(col("dof"), 6).as("dof"), col("significant"))
  }

  val welchTtestSql: String =
    """WITH pu AS (SELECT user_id,
      |    CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 100 % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS DECIMAL(19,0))
      |      AS x
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |m AS (SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
      |  FROM pu GROUP BY 1),
      |a AS (SELECT n AS n_a, sx AS sx_a, sxx AS sxx_a FROM m WHERE arm = 'A'),
      |b AS (SELECT n AS n_b, sx AS sx_b, sxx AS sxx_b FROM m WHERE arm = 'B'),
      |f AS (SELECT n_a, n_b,
      |    CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
      |    CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
      |    ((CAST(sxx_a AS DOUBLE) - CAST(n_a AS DOUBLE) *
      |      ((CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)) *
      |       (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)))) /
      |      (CAST(n_a AS DOUBLE) - 1)) / CAST(n_a AS DOUBLE) AS sa,
      |    ((CAST(sxx_b AS DOUBLE) - CAST(n_b AS DOUBLE) *
      |      ((CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)) *
      |       (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)))) /
      |      (CAST(n_b AS DOUBLE) - 1)) / CAST(n_b AS DOUBLE) AS sb
      |  FROM a CROSS JOIN b),
      |g AS (SELECT n_a, n_b, ma, mb,
      |    (ma - mb) / sqrt(sa + sb) AS t,
      |    ((sa + sb) * (sa + sb)) /
      |      ((sa * sa) / (CAST(n_a AS DOUBLE) - 1) +
      |       (sb * sb) / (CAST(n_b AS DOUBLE) - 1)) AS dof
      |  FROM f)
      |SELECT n_a, n_b,
      |  ROUND(ma / 1000000.0, 6) AS mean_a, ROUND(mb / 1000000.0, 6) AS mean_b,
      |  ROUND(t, 6) AS t_stat, ROUND(dof, 6) AS dof,
      |  abs(t) > 1.959963984540054 AS significant
      |FROM g""".stripMargin

  // --------------------------------------------------------------------------
  // Gumbel block-maxima return levels
  // --------------------------------------------------------------------------

  /** Gumbel return levels of the DAILY PEAK event value at 30/90/365-day
    * horizons ([[graft.ext.Series.gumbelReturnLevels]]) — extreme-value
    * capacity planning over the day-maxima series.
    */
  def qGumbelLevels(spark: SparkSession, dir: String): DataFrame = {
    val dailyMax = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(max((col("value").cast("decimal(18,6)") * lit(1000000))
        .cast("decimal(19,0)")).as("x_micro"))
    graft.ext.Series.gumbelReturnLevels(dailyMax, "x_micro", Seq(30, 90, 365))
      .select(col("t_blocks"), col("n_blocks"),
        round(col("mu") / 1000000.0, 6).as("mu"),
        round(col("beta") / 1000000.0, 6).as("beta"),
        round(col("return_level") / 1000000.0, 6).as("return_level"))
  }

  val gumbelLevelsSql: String =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    MAX(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS DECIMAL(19,0)))
      |      AS x
      |  FROM events GROUP BY 1),
      |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx FROM daily),
      |f AS (SELECT n,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xb,
      |    sqrt((CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE) *
      |      ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
      |       (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) /
      |      (CAST(n AS DOUBLE) - 1)) AS s
      |  FROM m),
      |g AS (SELECT n, xb, s * 0.779696801233676 AS beta FROM f),
      |h AS (SELECT n, xb - 0.5772156649015329 * beta AS mu, beta FROM g),
      |t AS (SELECT unnest([30, 90, 365]) AS t_blocks)
      |SELECT t_blocks, n AS n_blocks,
      |  ROUND(mu / 1000000.0, 6) AS mu, ROUND(beta / 1000000.0, 6) AS beta,
      |  ROUND((mu - beta * ln(-ln(1.0 - 1.0 / CAST(t_blocks AS DOUBLE)))) /
      |    1000000.0, 6) AS return_level
      |FROM h CROSS JOIN t ORDER BY t_blocks""".stripMargin

  // --------------------------------------------------------------------------
  // Interpolated trigram NLL
  // --------------------------------------------------------------------------

  /** Per-document trigram-LM negative log likelihood with three-way
    * Jelinek-Mercer backoff ([[graft.ext.TextQuality.trigramNll]]) — the top
    * rung of the unigram/bigram/trigram quality-filter ladder.
    */
  def qTrigramNll(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextQuality.trigramNll(Tables.documents(spark, dir),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  val trigramNllSql: String =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |tg AS (SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i]))
      |      AS w1,
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i+1]))
      |      AS w2,
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i+2]))
      |      AS w3
      |  FROM s),
      |dtf AS (SELECT doc_id, w1, w2, w3, COUNT(*) AS tf FROM tg
      |  GROUP BY 1, 2, 3, 4),
      |c3 AS (SELECT w1, w2, w3, CAST(SUM(tf) AS BIGINT) AS cnt3 FROM dtf
      |  GROUP BY 1, 2, 3),
      |bg AS (SELECT
      |    unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i]))
      |      AS b1,
      |    unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i+1]))
      |      AS b2
      |  FROM s),
      |c2 AS (SELECT b1, b2, COUNT(*) AS cnt2 FROM bg GROUP BY 1, 2),
      |tok AS (SELECT unnest(l) AS t0 FROM s),
      |c1 AS (SELECT t0, COUNT(*) AS cnt1 FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt1) AS BIGINT) AS total FROM c1)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_trigrams,
      |  ROUND(-CAST(SUM(CAST(tf * ln(0.6 * (CAST(cnt3 AS DOUBLE) / ctx.cnt2)
      |      + 0.3 * (CAST(suf.cnt2 AS DOUBLE) / u2.cnt1)
      |      + 0.1 * (CAST(u3.cnt1 AS DOUBLE) / total)) AS DECIMAL(18,8)))
      |      AS DOUBLE) / CAST(SUM(tf) AS BIGINT), 6) AS avg_nll3
      |FROM dtf JOIN c3 USING (w1, w2, w3)
      |  JOIN c2 ctx ON dtf.w1 = ctx.b1 AND dtf.w2 = ctx.b2
      |  JOIN c2 suf ON dtf.w2 = suf.b1 AND dtf.w3 = suf.b2
      |  JOIN c1 u2 ON dtf.w2 = u2.t0
      |  JOIN c1 u3 ON dtf.w3 = u3.t0
      |  CROSS JOIN tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Lloyd k-means iteration
  // --------------------------------------------------------------------------

  /** One full Lloyd round over the embeddings (assign → per-dim DECIMAL mean
    * update → re-assign; [[graft.ext.Clustering.lloydIterations]]) from the
    * deterministic `vec_id < 8` seeds — the iterative completion of
    * q_centroid_assign, oracle-checked through the centroid UPDATE, which
    * the assignment-only query never exercises.
    */
  def qKmeansIters(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    graft.ext.Clustering.lloydIterations(emb, "vec_id", "embedding",
        seeds, "cid", "cvec", iters = 1, dims = 64)
      .select(col("centroid_id"), col("n_members"),
        round(col("mean_cos"), 6).as("mean_cos"))
      .orderBy(col("centroid_id"))
  }

  val kmeansItersSql: String =
    """WITH v AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nv
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid,
      |    list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE)
      |      AS ce
      |  FROM embeddings WHERE vec_id < 8),
      |cn0 AS (SELECT cid, ce, sqrt(list_sum(list_transform(
      |    generate_series(1, 64), i -> ce[i] * ce[i]))) AS nc FROM c0),
      |s1 AS (SELECT v.vec_id, cn0.cid,
      |    CASE WHEN v.nv = 0 OR cn0.nc = 0 THEN 0.0
      |      ELSE list_sum(list_transform(generate_series(1, 64),
      |        i -> v.embedding[i]::DOUBLE * cn0.ce[i])) / (v.nv * cn0.nc)
      |    END AS cos
      |  FROM v CROSS JOIN cn0),
      |a1 AS (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY cos DESC, cid) AS rk FROM s1),
      |asn1 AS (SELECT vec_id, cid FROM a1 WHERE rk = 1),
      |upd AS (SELECT asn1.cid, ii.i,
      |    CAST(SUM(CAST(v.embedding[ii.i]::DOUBLE AS DECIMAL(18,9)))
      |      AS DOUBLE) / COUNT(*) AS mu
      |  FROM asn1 JOIN v USING (vec_id)
      |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) ii
      |  GROUP BY 1, 2),
      |c1 AS (SELECT cid, list(mu ORDER BY i) AS ce FROM upd GROUP BY 1),
      |cn1 AS (SELECT cid, ce, sqrt(list_sum(list_transform(
      |    generate_series(1, 64), i -> ce[i] * ce[i]))) AS nc FROM c1),
      |s2 AS (SELECT v.vec_id, cn1.cid,
      |    CASE WHEN v.nv = 0 OR cn1.nc = 0 THEN 0.0
      |      ELSE list_sum(list_transform(generate_series(1, 64),
      |        i -> v.embedding[i]::DOUBLE * cn1.ce[i])) / (v.nv * cn1.nc)
      |    END AS cos
      |  FROM v CROSS JOIN cn1),
      |a2 AS (SELECT vec_id, cid, cos, ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY cos DESC, cid) AS rk FROM s2),
      |asn2 AS (SELECT vec_id, cid, cos FROM a2 WHERE rk = 1)
      |SELECT cid AS centroid_id, COUNT(*) AS n_members,
      |  ROUND(CAST(SUM(CAST(cos AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*), 6)
      |    AS mean_cos
      |FROM asn2 GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Grouped HyperLogLog
  // --------------------------------------------------------------------------

  /** Per-event-type distinct-user HLL audit
    * ([[Sketches.hyperLogLogGroupedAudit]]) — one 64-register sketch per
    * source, the per-partition cardinality profile a 100 TB ingest ships
    * instead of per-source distinct shuffles.
    */
  def qHllGrouped(spark: SparkSession, dir: String): DataFrame =
    Sketches.hyperLogLogGroupedAudit(Tables.events(spark, dir),
        "event_type", "user_id", b = 6)
      .select(col("event_type"), col("v_empty"),
        round(col("hll_estimate"), 6).as("hll_estimate"),
        col("true_distinct"), round(col("rel_err_pct"), 6).as("rel_err_pct"))

  val hllGroupedSql: String =
    """WITH h AS (SELECT event_type AS grp,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) AS h
      |  FROM events),
      |hw AS (SELECT grp, h % 64 AS idx, h // 64 AS w FROM h),
      |r AS (SELECT grp, idx, MAX(CASE WHEN w = 0 THEN 27
      |    ELSE 27 - len(bin(w)) END) AS mreg FROM hw GROUP BY 1, 2),
      |spine AS (SELECT grp, idx FROM (SELECT DISTINCT event_type AS grp
      |    FROM events) CROSS JOIN (SELECT unnest(generate_series(0, 63))
      |    AS idx)),
      |fl AS (SELECT spine.grp, spine.idx, COALESCE(mreg, 0) AS mreg
      |  FROM spine LEFT JOIN r USING (grp, idx)),
      |z AS (SELECT grp, SUM(power(2.0, -CAST(mreg AS DOUBLE))) AS zsum,
      |    CAST(SUM(CASE WHEN mreg = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_empty
      |  FROM fl GROUP BY 1),
      |ex AS (SELECT event_type AS grp, COUNT(DISTINCT user_id)
      |    AS true_distinct FROM events GROUP BY 1),
      |e AS (SELECT z.grp, v_empty, true_distinct,
      |    0.709 * (64.0 * 64.0) / zsum AS raw FROM z JOIN ex USING (grp)),
      |f AS (SELECT grp, v_empty, true_distinct,
      |    CASE WHEN raw <= 160.0 AND v_empty > 0
      |      THEN 64.0 * ln(64.0 / CAST(v_empty AS DOUBLE)) ELSE raw END AS est
      |  FROM e)
      |SELECT grp AS event_type, v_empty, ROUND(est, 6) AS hll_estimate,
      |  true_distinct,
      |  ROUND(100.0 * abs(est - CAST(true_distinct AS DOUBLE)) /
      |    CAST(true_distinct AS DOUBLE), 6) AS rel_err_pct
      |FROM f ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // Graph modularity of the LPA partition
  // --------------------------------------------------------------------------

  /** Newman modularity of q_communities' label-propagation partition over
    * the repeat-co-purchase graph ([[graft.ext.Communities.modularity]]) —
    * the quality score that says whether the partition found real structure
    * (Q ≳ 0.3) or noise (Q ≈ 0). The oracle replays the 3 LPA rounds AND
    * the modularity arithmetic.
    */
  def qModularity(spark: SparkSession, dir: String): DataFrame = {
    // the edge table feeds LPA (3 rounds) AND the modularity joins —
    // checkpoint once so the basket-explode pipeline doesn't re-run per
    // consumer (the q_dedup_prefix localCheckpoint discipline)
    val edges = SummitQueries.copurchaseEdges(spark, dir)
      .localCheckpoint(eager = true)
    val labels = graft.ext.Communities.labelPropagation(edges,
      "src", "dst", "w", iters = 3)
    graft.ext.Communities.modularity(edges, "src", "dst", "w",
        labels, "node", "label")
      .select(col("n_communities"), col("total_weight"),
        round(col("modularity"), 6).as("modularity"))
  }

  val modularitySql: String =
    s"""WITH ${SummitQueries.communitiesCtes},
      |lab AS (SELECT node, label FROM l3),
      |mm AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM e),
      |intra AS (SELECT la.label AS c, CAST(SUM(e.w) AS BIGINT) AS ec
      |  FROM e JOIN lab la ON e.a = la.node
      |  JOIN lab lb ON e.b = lb.node AND la.label = lb.label
      |  GROUP BY 1),
      |deg AS (SELECT la.label AS c, CAST(SUM(s.w) AS BIGINT) AS dc
      |  FROM sym s JOIN lab la ON s.src = la.node GROUP BY 1),
      |terms AS (SELECT deg.c,
      |    CAST(CAST(COALESCE(ec, 0) AS DOUBLE) / CAST(m AS DOUBLE) -
      |      (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))) *
      |      (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
      |      AS DECIMAL(28,12)) AS t, m
      |  FROM deg LEFT JOIN intra USING (c) CROSS JOIN mm)
      |SELECT COUNT(*) AS n_communities, m AS total_weight,
      |  ROUND(CAST(SUM(t) AS DOUBLE), 6) AS modularity
      |FROM terms GROUP BY m""".stripMargin

  // --------------------------------------------------------------------------
  // Effective sample size of DSIR importance weights
  // --------------------------------------------------------------------------

  /** Kish ESS per source of the per-token-geometric-mean DSIR importance
    * weights ([[graft.ext.Importance.effectiveSampleSize]] over
    * `exp(log_weight / n_tokens)`): ess_ratio → 1 means resampling toward
    * English behaves like a uniform sample; → 1/n means one document
    * dominates the source.
    */
  def qEssWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lw = graft.ext.Importance.dsirLogWeights(docs, "doc_id", "text",
      isTarget = col("lang") === "en", numBuckets = 256)
    val w = lw.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"),
        exp(col("log_weight") / col("n_tokens")).cast("decimal(18,9)").as("w"))
    graft.ext.Importance.effectiveSampleSize(w, "source", col("w"))
      .select(col("source"), col("n"), round(col("ess"), 6).as("ess"),
        round(col("ess_ratio"), 6).as("ess_ratio"))
  }

  val essWeightsSql: String =
    s"""WITH dw AS (SELECT * FROM (
      |${VanguardQueries.dsirWeightsSql}
      |)),
      |w AS (SELECT d.source,
      |    CAST(exp(dw.log_weight / dw.n_tokens) AS DECIMAL(18,9)) AS w
      |  FROM dw JOIN documents d USING (doc_id)),
      |m AS (SELECT source, COUNT(*) AS n, SUM(w) AS sw, SUM(w * w) AS sww
      |  FROM w GROUP BY 1)
      |SELECT source, n,
      |  ROUND((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)) /
      |    CAST(sww AS DOUBLE), 6) AS ess,
      |  ROUND(((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)) /
      |    CAST(sww AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS ess_ratio
      |FROM m ORDER BY source""".stripMargin

  // --------------------------------------------------------------------------
  // UCB1 exploration scores
  // --------------------------------------------------------------------------

  /** UCB1 ranking of brands by non-return rate with the exploration bonus
    * ([[graft.ext.Experiment.ucb1]]) — which brand a bandit-driven
    * merchandising loop would surface next.
    */
  def qUcbScores(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
    graft.ext.Experiment.ucb1(src, "p_brand",
        when(col("l_returnflag") =!= "R", 1L).otherwise(0L))
      .select(col("arm"), col("n_pulls"),
        round(col("mean_reward"), 6).as("mean_reward"),
        round(col("ucb_bonus"), 6).as("ucb_bonus"),
        round(col("ucb_score"), 6).as("ucb_score"),
        col("rank").as("arm_rank"))
      .orderBy(col("arm_rank"))
  }

  val ucbScoresSql: String =
    """WITH arms AS (SELECT p_brand AS arm, COUNT(*) AS n_pulls,
      |    CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_pulls) AS BIGINT) AS nn FROM arms),
      |s AS (SELECT arm, n_pulls,
      |    CAST(r AS DOUBLE) / CAST(n_pulls AS DOUBLE) AS mean_reward,
      |    sqrt(2.0 * ln(CAST(nn AS DOUBLE)) / CAST(n_pulls AS DOUBLE))
      |      AS ucb_bonus
      |  FROM arms CROSS JOIN tot)
      |SELECT arm, n_pulls, ROUND(mean_reward, 6) AS mean_reward,
      |  ROUND(ucb_bonus, 6) AS ucb_bonus,
      |  ROUND(mean_reward + ucb_bonus, 6) AS ucb_score,
      |  ROW_NUMBER() OVER (ORDER BY mean_reward + ucb_bonus DESC, arm)
      |    AS arm_rank
      |FROM s ORDER BY arm_rank""".stripMargin

  // --------------------------------------------------------------------------
  // Cluster evaluation vs gold labels (BCubed, ARI)
  // --------------------------------------------------------------------------

  private def assignVsGold(spark: SparkSession, dir: String) = {
    val emb = Tables.embeddings(spark, dir)
    val asn = graft.ext.Clustering.assignToCentroids(emb, "vec_id",
        "embedding", ExtQueries.seedCentroids(spark, dir), "cid", "cvec")
      .select(col("vec_id"), col("centroid_id"))
    (asn, emb.select(col("vec_id"), col("label")))
  }

  /** BCubed P/R/F of the centroid assignment against the gold embedding
    * labels ([[graft.ext.ClusterEval.bcubed]]) — does the geometric
    * partition recover the label classes?
    */
  def qBcubed(spark: SparkSession, dir: String): DataFrame = {
    val (asn, gold) = assignVsGold(spark, dir)
    graft.ext.ClusterEval.bcubed(asn, "vec_id", "centroid_id",
        gold, "vec_id", "label")
      .select(col("n"), col("n_clusters"), col("n_classes"),
        round(col("bcubed_p"), 6).as("bcubed_p"),
        round(col("bcubed_r"), 6).as("bcubed_r"),
        round(col("bcubed_f"), 6).as("bcubed_f"))
  }

  val bcubedSql: String =
    s"""WITH ${ExtQueries.centroidAssignCtes},
      |asn AS (SELECT vec_id, cid FROM r WHERE rk = 1),
      |cells AS (SELECT asn.cid AS c, e.label AS g, COUNT(*) AS nij
      |  FROM asn JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
      |ai AS (SELECT c, CAST(SUM(nij) AS BIGINT) AS ai FROM cells GROUP BY 1),
      |bj AS (SELECT g, CAST(SUM(nij) AS BIGINT) AS bj FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n,
      |    COUNT(DISTINCT c) AS n_clusters, COUNT(DISTINCT g) AS n_classes
      |  FROM cells),
      |terms AS (SELECT
      |    CAST(CAST(CAST(nij AS DECIMAL(19,0)) * CAST(nij AS DECIMAL(19,0))
      |      AS DOUBLE) / CAST(ai AS DOUBLE) AS DECIMAL(28,12)) AS tp,
      |    CAST(CAST(CAST(nij AS DECIMAL(19,0)) * CAST(nij AS DECIMAL(19,0))
      |      AS DOUBLE) / CAST(bj AS DOUBLE) AS DECIMAL(28,12)) AS tr
      |  FROM cells JOIN ai USING (c) JOIN bj USING (g)),
      |ss AS (SELECT SUM(tp) AS sp, SUM(tr) AS sr FROM terms),
      |f AS (SELECT n, n_clusters, n_classes,
      |    CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) AS r
      |  FROM ss CROSS JOIN tot)
      |SELECT n, n_clusters, n_classes,
      |  ROUND(p, 6) AS bcubed_p, ROUND(r, 6) AS bcubed_r,
      |  ROUND((2.0 * p) * r / (p + r), 6) AS bcubed_f
      |FROM f""".stripMargin

  /** Adjusted Rand index of the same assignment-vs-labels comparison
    * ([[graft.ext.ClusterEval.adjustedRandIndex]]) — the chance-corrected
    * pair-counting partner of q_bcubed.
    */
  def qAri(spark: SparkSession, dir: String): DataFrame = {
    val (asn, gold) = assignVsGold(spark, dir)
    graft.ext.ClusterEval.adjustedRandIndex(asn, "vec_id", "centroid_id",
        gold, "vec_id", "label")
      .select(col("n"), round(col("sum_pairs_cells"), 6).as("sum_pairs_cells"),
        round(col("expected_index"), 6).as("expected_index"),
        round(col("max_index"), 6).as("max_index"),
        round(col("ari"), 6).as("ari"))
  }

  val ariSql: String =
    s"""WITH ${ExtQueries.centroidAssignCtes},
      |asn AS (SELECT vec_id, cid FROM r WHERE rk = 1),
      |cells AS (SELECT asn.cid AS c, e.label AS g, COUNT(*) AS nij
      |  FROM asn JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
      |sidx AS (SELECT SUM(CAST(nij AS DECIMAL(19,0)) *
      |      CAST(nij - 1 AS DECIMAL(19,0))) AS sidx2,
      |    CAST(SUM(nij) AS BIGINT) AS n FROM cells),
      |sa AS (SELECT SUM(CAST(ai AS DECIMAL(19,0)) *
      |      CAST(ai - 1 AS DECIMAL(19,0))) AS sa2
      |  FROM (SELECT CAST(SUM(nij) AS BIGINT) AS ai FROM cells GROUP BY c)),
      |sb AS (SELECT SUM(CAST(bj AS DECIMAL(19,0)) *
      |      CAST(bj - 1 AS DECIMAL(19,0))) AS sb2
      |  FROM (SELECT CAST(SUM(nij) AS BIGINT) AS bj FROM cells GROUP BY g)),
      |f AS (SELECT n,
      |    CAST(sidx2 AS DOUBLE) / 2.0 AS sidx,
      |    CAST(sa2 AS DOUBLE) / 2.0 AS sa,
      |    CAST(sb2 AS DOUBLE) / 2.0 AS sb,
      |    CAST(CAST(n AS DECIMAL(19,0)) * CAST(n - 1 AS DECIMAL(19,0))
      |      AS DOUBLE) / 2.0 AS cn
      |  FROM sidx CROSS JOIN sa CROSS JOIN sb)
      |SELECT n, ROUND(sidx, 6) AS sum_pairs_cells,
      |  ROUND((sa * sb) / cn, 6) AS expected_index,
      |  ROUND((sa + sb) / 2.0, 6) AS max_index,
      |  ROUND((sidx - (sa * sb) / cn) / ((sa + sb) / 2.0 - (sa * sb) / cn), 6)
      |    AS ari
      |FROM f""".stripMargin

  // --------------------------------------------------------------------------
  // Held-out trigram NLL
  // --------------------------------------------------------------------------

  /** Held-out trigram perplexity: train counts from the deterministic 80%
    * md5 split, TEST docs scored with four-way backoff
    * ([[graft.ext.TextQuality.heldoutTrigramNll]]) — the honest LM quality
    * score (q_trigram_nll's in-corpus MLE lets unique text predict itself).
    */
  def qHeldoutNll(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextQuality.heldoutTrigramNll(Tables.documents(spark, dir),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  val heldoutNllSql: String =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS l,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 100 < 80 AS is_train
      |  FROM documents),
      |tr AS (SELECT * FROM s WHERE is_train),
      |te AS (SELECT * FROM s WHERE NOT is_train),
      |tg AS (SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i]))
      |      AS w1,
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i+1]))
      |      AS w2,
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i+2]))
      |      AS w3
      |  FROM te),
      |dtf AS (SELECT doc_id, w1, w2, w3, COUNT(*) AS tf FROM tg
      |  GROUP BY 1, 2, 3, 4),
      |tg3 AS (SELECT
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i]))
      |      AS w1,
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i+1]))
      |      AS w2,
      |    unnest(list_transform(generate_series(1, len(l) - 2), i -> l[i+2]))
      |      AS w3
      |  FROM tr),
      |c3 AS (SELECT w1, w2, w3, COUNT(*) AS cnt3 FROM tg3 GROUP BY 1, 2, 3),
      |bg AS (SELECT
      |    unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i]))
      |      AS b1,
      |    unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i+1]))
      |      AS b2
      |  FROM tr),
      |c2 AS (SELECT b1, b2, COUNT(*) AS cnt2 FROM bg GROUP BY 1, 2),
      |tok AS (SELECT unnest(l) AS t0 FROM tr),
      |c1 AS (SELECT t0, COUNT(*) AS cnt1 FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt1) AS BIGINT) AS nn, COUNT(*) AS vv FROM c1)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_trigrams,
      |  ROUND(-CAST(SUM(CAST(tf * ln(
      |      0.5 * (CASE WHEN ctx.cnt2 IS NOT NULL
      |        THEN CAST(COALESCE(c3.cnt3, 0) AS DOUBLE) / ctx.cnt2
      |        ELSE 0.0 END)
      |      + 0.3 * (CASE WHEN u2.cnt1 IS NOT NULL
      |        THEN CAST(COALESCE(suf.cnt2, 0) AS DOUBLE) / u2.cnt1
      |        ELSE 0.0 END)
      |      + 0.15 * (CAST(COALESCE(u3.cnt1, 0) AS DOUBLE) / nn)
      |      + 0.05 * (1.0 / vv)) AS DECIMAL(18,8))) AS DOUBLE) /
      |    CAST(SUM(tf) AS BIGINT), 6) AS heldout_nll
      |FROM dtf LEFT JOIN c3 USING (w1, w2, w3)
      |  LEFT JOIN c2 ctx ON dtf.w1 = ctx.b1 AND dtf.w2 = ctx.b2
      |  LEFT JOIN c2 suf ON dtf.w2 = suf.b1 AND dtf.w3 = suf.b2
      |  LEFT JOIN c1 u2 ON dtf.w2 = u2.t0
      |  LEFT JOIN c1 u3 ON dtf.w3 = u3.t0
      |  CROSS JOIN tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Kneser-Ney bigram NLL
  // --------------------------------------------------------------------------

  /** Per-document Kneser-Ney bigram NLL (d = 0.75)
    * ([[graft.ext.TextQuality.kneserNeyBigramNll]]) — the production n-gram
    * smoothing next to q_bigram_nll's Jelinek-Mercer mixture.
    */
  def qKnBigramNll(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextQuality.kneserNeyBigramNll(Tables.documents(spark, dir),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  val knBigramNllSql: String =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |bg AS (SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i]))
      |      AS w1,
      |    unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i+1]))
      |      AS w2
      |  FROM s),
      |dbf AS (SELECT doc_id, w1, w2, COUNT(*) AS bf FROM bg GROUP BY 1, 2, 3),
      |c2 AS (SELECT w1, w2, CAST(SUM(bf) AS BIGINT) AS c12 FROM dbf
      |  GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS nf
      |  FROM c2 GROUP BY 1),
      |bwd AS (SELECT w2, COUNT(*) AS nb FROM c2 GROUP BY 1),
      |nbt AS (SELECT COUNT(*) AS nbt FROM c2)
      |SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
      |  ROUND(-CAST(SUM(CAST(bf * ln(
      |      (CAST(c12 AS DOUBLE) - 0.75) / c1 +
      |      ((0.75 * nf) / c1) * (CAST(nb AS DOUBLE) / nbt))
      |      AS DECIMAL(18,8))) AS DOUBLE) / CAST(SUM(bf) AS BIGINT), 6)
      |    AS kn_nll
      |FROM dbf JOIN c2 USING (w1, w2)
      |  JOIN ctx USING (w1)
      |  JOIN bwd USING (w2)
      |  CROSS JOIN nbt
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Differential-privacy sensitivity audit
  // --------------------------------------------------------------------------

  /** Per-event-type L1 sensitivity audit ([[graft.ext.Privacy.dpSensitivity]])
    * — max single-user contribution and whale count, the clipping bound any
    * DP release of per-type counts would need.
    */
  def qDpSensitivity(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Privacy.dpSensitivity(Tables.events(spark, dir),
        "event_type", "user_id", whalePct = 1)
      .select(col("event_type"), col("n_events"), col("n_users"),
        col("max_user_n"), round(col("max_share"), 6).as("max_share"),
        col("n_whales"))

  val dpSensitivitySql: String =
    """WITH pu AS (SELECT event_type AS key, user_id,
      |    COUNT(*) AS user_n FROM events GROUP BY 1, 2),
      |pk AS (SELECT key, CAST(SUM(user_n) AS BIGINT) AS n_events,
      |    COUNT(*) AS n_users, MAX(user_n) AS max_user_n
      |  FROM pu GROUP BY 1),
      |wh AS (SELECT pu.key, COUNT(*) AS n_whales
      |  FROM pu JOIN pk USING (key)
      |  WHERE pu.user_n * 100 > pk.n_events * 1 GROUP BY 1)
      |SELECT pk.key AS event_type, n_events, n_users, max_user_n,
      |  ROUND(CAST(max_user_n AS DOUBLE) / n_events, 6) AS max_share,
      |  COALESCE(n_whales, 0) AS n_whales
      |FROM pk LEFT JOIN wh ON pk.key = wh.key
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // Feature-hashed document similarity
  // --------------------------------------------------------------------------

  /** Top-10 documents by feature-hashed bag-of-words cosine against doc 0
    * ([[graft.ext.HashedEmbedding.topKSimilar]], D=64) — the no-model
    * text→vector bridge, fully relational (vectors are (doc, dim, v) rows,
    * dots an equi-join), so the whole sketch is oracle-checked.
    */
  def qHashedTopk(spark: SparkSession, dir: String): DataFrame =
    graft.ext.HashedEmbedding.topKSimilar(Tables.documents(spark, dir),
        "doc_id", "text", queryId = 0L, k = 10, dims = 64)
      .select(col("rank").as("sim_rank"), col("doc_id"), col("dot"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("sim_rank"))

  val hashedTopkSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' '))
      |    AS tok FROM documents),
      |th AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
      |    AS h FROM toks WHERE len(tok) > 0),
      |vec AS (SELECT doc_id, h % 64 AS dim,
      |    CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)
      |      AS BIGINT) AS v
      |  FROM th GROUP BY 1, 2
      |  HAVING SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) <> 0),
      |norms AS (SELECT doc_id, CAST(SUM(v * v) AS BIGINT) AS n2 FROM vec
      |  GROUP BY 1),
      |qv AS (SELECT dim, v AS qv FROM vec WHERE doc_id = 0),
      |qn AS (SELECT n2 AS qn2 FROM norms WHERE doc_id = 0),
      |dots AS (SELECT vec.doc_id, CAST(SUM(v * qv) AS BIGINT) AS dot
      |  FROM vec JOIN qv USING (dim) WHERE vec.doc_id <> 0 GROUP BY 1),
      |sc AS (SELECT d.doc_id, dot,
      |    CAST(dot AS DOUBLE) /
      |      (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))) AS cosine
      |  FROM dots d JOIN norms USING (doc_id) CROSS JOIN qn),
      |top AS (SELECT doc_id, dot, cosine,
      |    ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS sim_rank
      |  FROM sc)
      |SELECT sim_rank, doc_id, dot, ROUND(cosine, 6) AS cosine
      |FROM top WHERE sim_rank <= 10 ORDER BY sim_rank""".stripMargin

  // --------------------------------------------------------------------------
  // Post-stratified mean
  // --------------------------------------------------------------------------

  /** Mean customer spend post-stratified by market segment
    * ([[graft.ext.Experiment.postStratifiedMean]]): sample = customers with
    * orders, population = all customers — corrects the raw responder mean
    * for segment response skew. Dollars out.
    */
  def qPostStratified(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val spend = Tables.orders(spark, dir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)") * lit(10000))
        .cast("decimal(19,0)").as("x"))
    graft.ext.Experiment.postStratifiedMean(spend, cust, "c_mktsegment",
        col("x"))
      .select(col("n_sample"), col("n_strata_used"), col("n_strata_pop"),
        round(col("raw_mean") / 10000.0, 6).as("raw_mean"),
        round(col("post_mean") / 10000.0, 6).as("post_mean"),
        round(col("post_se") / 10000.0, 6).as("post_se"))
  }

  val postStratifiedSql: String =
    """WITH spend AS (SELECT c_mktsegment AS h, o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)) * 10000)
      |      AS DECIMAL(19,0)) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      |s AS (SELECT h, COUNT(*) AS n, CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx FROM spend GROUP BY 1),
      |p AS (SELECT c_mktsegment AS h, COUNT(*) AS nh FROM customer
      |  GROUP BY 1),
      |ptot AS (SELECT CAST(SUM(nh) AS BIGINT) AS npop,
      |    COUNT(*) AS n_strata_pop FROM p),
      |stot AS (SELECT CAST(SUM(n) AS BIGINT) AS ns,
      |    CAST(SUM(sx) AS DECIMAL(38,0)) AS sxall FROM s),
      |terms AS (SELECT s.h, s.n, n_strata_pop,
      |    CAST((CAST(nh AS DOUBLE) / CAST(npop AS DOUBLE)) *
      |      (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(28,10))
      |      AS tmean,
      |    CAST(((CAST(nh AS DOUBLE) / CAST(npop AS DOUBLE)) *
      |      (CAST(nh AS DOUBLE) / CAST(npop AS DOUBLE)) *
      |      ((CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE) *
      |        ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
      |         (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) /
      |        (CAST(n AS DOUBLE) - 1))) / CAST(n AS DOUBLE)
      |      AS DECIMAL(28,10)) AS tvar
      |  FROM s JOIN p USING (h) CROSS JOIN ptot WHERE s.n > 1),
      |agg AS (SELECT COUNT(*) AS n_strata_used,
      |    ANY_VALUE(n_strata_pop) AS n_strata_pop,
      |    SUM(tmean) AS pm, SUM(tvar) AS pv FROM terms)
      |SELECT ns AS n_sample, n_strata_used, n_strata_pop,
      |  ROUND((CAST(sxall AS DOUBLE) / CAST(ns AS DOUBLE)) / 10000.0, 6)
      |    AS raw_mean,
      |  ROUND(CAST(pm AS DOUBLE) / 10000.0, 6) AS post_mean,
      |  ROUND(sqrt(CAST(pv AS DOUBLE)) / 10000.0, 6) AS post_se
      |FROM agg CROSS JOIN stot""".stripMargin

  // --------------------------------------------------------------------------
  // Upper-tail dependence
  // --------------------------------------------------------------------------

  /** λ_U of (l_quantity, l_extendedprice) at q ∈ {0.9, 0.95, 0.99}
    * ([[graft.ext.RankCorr.tailDependence]]) — do the largest orders and the
    * largest line revenues spike together beyond what correlation shows?
    */
  def qTailDependence(spark: SparkSession, dir: String): DataFrame =
    graft.ext.RankCorr.tailDependence(Tables.lineitem(spark, dir),
        "l_quantity", "l_extendedprice",
        tieCols = Seq("l_orderkey", "l_linenumber"),
        probs = Seq(0.9, 0.95, 0.99))
      .select(col("p"), col("tx"), col("ty"), col("n_joint"), col("n_y"),
        round(col("lambda_u"), 6).as("lambda_u"))

  val tailDependenceSql: String =
    """WITH rx AS (SELECT l_quantity AS v,
      |    ROW_NUMBER() OVER (ORDER BY l_quantity, l_orderkey, l_linenumber)
      |      AS rn, COUNT(*) OVER () AS n
      |  FROM lineitem),
      |tx AS (SELECT CAST(p AS DOUBLE) AS p, v AS tx FROM rx
      |  JOIN (VALUES (0.90), (0.95), (0.99)) t(p)
      |    ON rn = GREATEST(1, CAST(ceil(CAST(p AS DOUBLE) * n) AS BIGINT))),
      |ry AS (SELECT l_extendedprice AS v,
      |    ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
      |      l_linenumber) AS rn, COUNT(*) OVER () AS n
      |  FROM lineitem),
      |ty AS (SELECT CAST(p AS DOUBLE) AS p, v AS ty FROM ry
      |  JOIN (VALUES (0.90), (0.95), (0.99)) t(p)
      |    ON rn = GREATEST(1, CAST(ceil(CAST(p AS DOUBLE) * n) AS BIGINT))),
      |th AS (SELECT tx.p, tx.tx, ty.ty FROM tx JOIN ty USING (p)),
      |c AS (SELECT p, tx, ty,
      |    CAST(SUM(CASE WHEN l_extendedprice > ty THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_y,
      |    CAST(SUM(CASE WHEN l_quantity > tx AND l_extendedprice > ty
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_joint
      |  FROM lineitem CROSS JOIN th GROUP BY 1, 2, 3)
      |SELECT p, tx, ty, n_joint, n_y,
      |  ROUND(CAST(n_joint AS DOUBLE) / n_y, 6) AS lambda_u
      |FROM c ORDER BY p""".stripMargin

  // --------------------------------------------------------------------------
  // Naive forecasting backtest
  // --------------------------------------------------------------------------

  /** Naive-1 vs seasonal-naive-7 backtest per event type over daily value
    * sums ([[graft.ext.Forecast.naiveBacktest]]) — the MASE floor any
    * forecast must beat; micro units rescaled to original units.
    */
  def qNaiveBacktest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)") * lit(1000000))
        .cast("decimal(19,0)").as("x_micro"))
    graft.ext.Forecast.naiveBacktest(daily, "event_type", "day", "x_micro")
      .select(col("event_type"), col("n1"),
        round(col("mae_naive1") / 1000000.0, 6).as("mae_naive1"),
        col("n7"),
        round(col("mae_naive7") / 1000000.0, 6).as("mae_naive7"),
        round(col("mase7"), 6).as("mase7"))
  }

  val naiveBacktestSql: String =
    """WITH daily AS (SELECT event_type AS g, date_trunc('day', ts) AS d,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS DECIMAL(19,0))
      |      AS x
      |  FROM events GROUP BY 1, 2),
      |e1 AS (SELECT a.g, COUNT(*) AS n1,
      |    CAST(SUM(abs(a.x - b.x)) AS DECIMAL(38,0)) AS s1
      |  FROM daily a JOIN daily b
      |    ON a.g = b.g AND a.d = b.d + INTERVAL 1 DAY
      |  GROUP BY 1),
      |e7 AS (SELECT a.g, COUNT(*) AS n7,
      |    CAST(SUM(abs(a.x - b.x)) AS DECIMAL(38,0)) AS s7
      |  FROM daily a JOIN daily b
      |    ON a.g = b.g AND a.d = b.d + INTERVAL 7 DAY
      |  GROUP BY 1)
      |SELECT e1.g AS event_type, n1,
      |  ROUND((CAST(s1 AS DOUBLE) / n1) / 1000000.0, 6) AS mae_naive1,
      |  n7, ROUND((CAST(s7 AS DOUBLE) / n7) / 1000000.0, 6) AS mae_naive7,
      |  ROUND((CAST(s7 AS DOUBLE) / n7) / (CAST(s1 AS DOUBLE) / n1), 6)
      |    AS mase7
      |FROM e1 JOIN e7 USING (g) ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // Histogram quantile sketch audit
  // --------------------------------------------------------------------------

  /** 128-bin histogram quantile estimates vs the exact percentile_disc
    * values ([[graft.ext.HistSketch.histQuantilesAudit]]) — the one-pass,
    * mergeable quantile path for 100 TB scans, with its error measured
    * before anyone trusts it.
    */
  def qHistQuantiles(spark: SparkSession, dir: String): DataFrame =
    graft.ext.HistSketch.histQuantilesAudit(Tables.lineitem(spark, dir),
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"),
        Seq(0.5, 0.9, 0.99), bins = 128)
      .select(col("p"), round(col("est"), 6).as("est"), col("exact_value"),
        round(col("abs_err"), 6).as("abs_err"),
        round(col("rel_err"), 6).as("rel_err"))

  val histQuantilesSql: String =
    """WITH v AS (SELECT l_extendedprice AS v FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL),
      |mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n FROM v),
      |binned AS (SELECT LEAST(CAST(floor(((v - lo) / (hi - lo)) * 128)
      |    AS BIGINT), 127) AS bin, COUNT(*) AS c
      |  FROM v CROSS JOIN mm GROUP BY 1),
      |cum AS (SELECT a.bin, a.c, COALESCE(SUM(b.c), 0) AS cum_before
      |  FROM binned a LEFT JOIN binned b ON b.bin < a.bin GROUP BY 1, 2),
      |ps AS (SELECT CAST(p AS DOUBLE) AS p
      |  FROM (VALUES (0.5), (0.9), (0.99)) t(p)),
      |tg AS (SELECT p, lo, hi, n,
      |    GREATEST(1, CAST(ceil(p * n) AS BIGINT)) AS target
      |  FROM ps CROSS JOIN mm),
      |est AS (SELECT p,
      |    lo + ((hi - lo) / 128) * (CAST(bin AS DOUBLE) +
      |      CAST(target - cum_before AS DOUBLE) / CAST(c AS DOUBLE)) AS est
      |  FROM tg JOIN cum ON target > cum_before
      |    AND target <= cum_before + c),
      |rx AS (SELECT l_extendedprice AS ev,
      |    ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
      |      l_linenumber) AS rn, COUNT(*) OVER () AS n
      |  FROM lineitem),
      |ex AS (SELECT CAST(p AS DOUBLE) AS p, ev AS exact_value FROM rx
      |  JOIN (VALUES (0.5), (0.9), (0.99)) t(p)
      |    ON rn = GREATEST(1, CAST(ceil(CAST(p AS DOUBLE) * n) AS BIGINT)))
      |SELECT est.p, ROUND(est, 6) AS est, exact_value,
      |  ROUND(abs(est - exact_value), 6) AS abs_err,
      |  ROUND(abs(est - exact_value) / abs(exact_value), 6) AS rel_err
      |FROM est JOIN ex USING (p) ORDER BY p""".stripMargin

  // --------------------------------------------------------------------------
  // Zone-map skipping audit
  // --------------------------------------------------------------------------

  /** Min/max chunk-skipping under natural vs value-sorted layout for a
    * price range predicate ([[graft.ext.Layout.zoneMapSkipAudit]], 64
    * simulated row groups) — the quantitative case for clustering the
    * table on its filter column.
    */
  def qZonemapSkip(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Layout.zoneMapSkipAudit(Tables.lineitem(spark, dir),
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"),
        chunks = 64, lo = 50000.0, hi = 55000.0)
      .select(col("layout"), col("n_chunks"), col("n_skippable"),
        round(col("skip_fraction"), 6).as("skip_fraction"))

  val zonemapSkipSql: String =
    """WITH proj AS (SELECT l_extendedprice AS v, l_orderkey, l_linenumber
      |  FROM lineitem),
      |nt AS (SELECT COUNT(*) AS total FROM proj),
      |nat AS (SELECT v, ROW_NUMBER() OVER (ORDER BY l_orderkey,
      |    l_linenumber) AS rn FROM proj),
      |natc AS (SELECT ((rn - 1) * 64) // total AS chunk, MIN(v) AS mn,
      |    MAX(v) AS mx FROM nat CROSS JOIN nt GROUP BY 1),
      |nata AS (SELECT 'natural' AS layout, COUNT(*) AS n_chunks,
      |    CAST(SUM(CASE WHEN mx < 50000.0 OR mn > 55000.0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_skippable FROM natc),
      |srt AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, l_orderkey,
      |    l_linenumber) AS rn FROM proj),
      |srtc AS (SELECT ((rn - 1) * 64) // total AS chunk, MIN(v) AS mn,
      |    MAX(v) AS mx FROM srt CROSS JOIN nt GROUP BY 1),
      |srta AS (SELECT 'sorted' AS layout, COUNT(*) AS n_chunks,
      |    CAST(SUM(CASE WHEN mx < 50000.0 OR mn > 55000.0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_skippable FROM srtc)
      |SELECT layout, n_chunks, n_skippable,
      |  ROUND(CAST(n_skippable AS DOUBLE) / n_chunks, 6) AS skip_fraction
      |FROM (SELECT * FROM nata UNION ALL SELECT * FROM srta)
      |ORDER BY layout""".stripMargin

  // --------------------------------------------------------------------------
  // Language-ID confusion / classifier evaluation
  // --------------------------------------------------------------------------

  /** Multi-class language-ID evaluated against the corpus's gold `lang`
    * column ([[graft.ext.TextStats.langIdEval]]): per-class P/R/F1 plus
    * accuracy and macro-F1 — q_lang_id_multi predicts, THIS grades (the zh
    * class has no stopword profile, so its recall-0 row is the honest
    * blind spot of the profile classifier).
    */
  def qLangidConfusion(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextStats.langIdEval(Tables.documents(spark, dir),
        "doc_id", "text", "lang")
      .select(col("lang"), col("n_gold"), col("n_pred"), col("tp"),
        round(col("precision"), 6).as("precision"),
        round(col("recall"), 6).as("recall"),
        round(col("f1"), 6).as("f1"),
        round(col("accuracy"), 6).as("accuracy"),
        round(col("macro_f1"), 6).as("macro_f1"))

  val langidConfusionSql: String = {
    val profile = graft.ext.TextStats.langProfiles
      .flatMap { case (lang, toks) => toks.map(t => s"('$t', '$lang')") }
      .mkString(", ")
    s"""WITH profile(tok, plang) AS (VALUES $profile),
      |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |h AS (SELECT doc_id, plang, COUNT(*) AS n_hits
      |  FROM tok JOIN profile USING (tok) GROUP BY 1, 2),
      |r AS (SELECT doc_id, plang, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY n_hits DESC, plang) AS rn FROM h),
      |preds AS (SELECT d.lang AS gold, COALESCE(r.plang, 'unk') AS pred
      |  FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id AND r.rn = 1),
      |cells AS (SELECT gold, pred, COUNT(*) AS nij FROM preds GROUP BY 1, 2),
      |tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN gold = pred THEN nij ELSE 0 END) AS BIGINT)
      |      AS n_correct FROM cells),
      |gq AS (SELECT gold, CAST(SUM(nij) AS BIGINT) AS n_gold,
      |    CAST(SUM(CASE WHEN pred = gold THEN nij ELSE 0 END) AS BIGINT)
      |      AS tp FROM cells GROUP BY 1),
      |pq AS (SELECT pred AS gold, CAST(SUM(nij) AS BIGINT) AS n_pred
      |  FROM cells GROUP BY 1),
      |pc AS (SELECT gq.gold, n_gold, COALESCE(n_pred, 0) AS n_pred, tp
      |  FROM gq LEFT JOIN pq USING (gold)),
      |mac AS (SELECT SUM(CAST((2.0 * tp) / (n_gold + n_pred)
      |    AS DECIMAL(28,12))) AS sf, COUNT(*) AS nc FROM pc)
      |SELECT gold AS lang, n_gold, n_pred, tp,
      |  ROUND(CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / n_pred
      |    ELSE 0.0 END, 6) AS precision,
      |  ROUND(CAST(tp AS DOUBLE) / n_gold, 6) AS recall,
      |  ROUND((2.0 * tp) / (n_gold + n_pred), 6) AS f1,
      |  ROUND(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy,
      |  ROUND(CAST(sf AS DOUBLE) / nc, 6) AS macro_f1
      |FROM pc CROSS JOIN tot CROSS JOIN mac ORDER BY lang""".stripMargin
  }

  // --------------------------------------------------------------------------
  // Percolation / attack tolerance
  // --------------------------------------------------------------------------

  /** Hub-removal robustness of the repeat-co-purchase graph
    * ([[graft.ext.GraphPaths.percolationAudit]], top-20 hubs): does the
    * giant component survive losing the whale items? The oracle replays
    * BOTH connected-components passes with recursive reach CTEs.
    */
  def qPercolation(spark: SparkSession, dir: String): DataFrame =
    graft.ext.GraphPaths.percolationAudit(
        InsightQueries.repeatEdges(spark, dir), "src", "dst", topKHubs = 20)
      .select(col("scenario"), col("n_nodes"), col("n_edges"),
        col("largest_cc"),
        round(col("largest_cc_share"), 6).as("largest_cc_share"))

  val percolationSql: String =
    s"""WITH RECURSIVE ${InsightQueries.repeatEdgesSql},
      |edges AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
      |deg AS (SELECT a AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
      |hubs AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT 20),
      |ea AS (SELECT a, b FROM e
      |  WHERE a NOT IN (SELECT node FROM hubs)
      |    AND b NOT IN (SELECT node FROM hubs)),
      |edgesa AS (SELECT a, b FROM ea UNION SELECT b, a FROM ea),
      |reach(id, r) AS (
      |      SELECT a, a FROM edges UNION SELECT a, b FROM edges
      |      UNION SELECT eg.a, r.r FROM edges eg JOIN reach r ON eg.b = r.id),
      |lab AS (SELECT id, MIN(r) AS c FROM reach GROUP BY 1),
      |reacha(id, r) AS (
      |      SELECT a, a FROM edgesa UNION SELECT a, b FROM edgesa
      |      UNION SELECT eg.a, r.r FROM edgesa eg
      |        JOIN reacha r ON eg.b = r.id),
      |laba AS (SELECT id, MIN(r) AS c FROM reacha GROUP BY 1),
      |s1 AS (SELECT 'intact' AS scenario,
      |    (SELECT COUNT(*) FROM lab) AS n_nodes,
      |    (SELECT COUNT(*) FROM e) AS n_edges,
      |    (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM lab GROUP BY c))
      |      AS largest_cc),
      |s2 AS (SELECT 'attacked' AS scenario,
      |    (SELECT COUNT(*) FROM laba) AS n_nodes,
      |    (SELECT COUNT(*) FROM ea) AS n_edges,
      |    (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM laba GROUP BY c))
      |      AS largest_cc),
      |u AS (SELECT * FROM s2 UNION ALL SELECT * FROM s1)
      |SELECT scenario, n_nodes, n_edges, largest_cc,
      |  ROUND(CAST(largest_cc AS DOUBLE) / n_nodes, 6) AS largest_cc_share
      |FROM u ORDER BY scenario""".stripMargin

  // --------------------------------------------------------------------------
  // Sampled join-cardinality estimation
  // --------------------------------------------------------------------------

  /** 10% two-independent-sample estimate of the l_partkey self-join
    * cardinality vs the exact Σc(k)²
    * ([[graft.ext.Profiling.sampledSelfJoinCardinality]]) — the optimizer
    * estimation audit: how much error does sampling buy at 1% of the work?
    */
  def qJoinCardSample(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profiling.sampledSelfJoinCardinality(
        Tables.lineitem(spark, dir), "l_partkey",
        rowKey = concat(col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string")),
        pctSample = 10)
      .select(col("n_rows"), col("exact_join_card"), col("sample_join_card"),
        col("estimate"), round(col("rel_err_pct"), 6).as("rel_err_pct"))

  val joinCardSampleSql: String =
    """WITH base AS (SELECT l_partkey AS k,
      |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
      |      CAST(l_linenumber AS VARCHAR) || ':a'), 1, 8)) AS BIGINT) % 100
      |      AS ba,
      |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
      |      CAST(l_linenumber AS VARCHAR) || ':b'), 1, 8)) AS BIGINT) % 100
      |      AS bb
      |  FROM lineitem),
      |ex AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
      |      AS BIGINT) AS exact_card
      |  FROM (SELECT k, COUNT(*) AS c FROM base GROUP BY 1)),
      |ca AS (SELECT k, COUNT(*) AS ca FROM base WHERE ba < 10 GROUP BY 1),
      |cb AS (SELECT k, COUNT(*) AS cb FROM base WHERE bb < 10 GROUP BY 1),
      |sm AS (SELECT COALESCE(CAST(SUM(CAST(ca AS DECIMAL(19,0)) *
      |    CAST(cb AS DECIMAL(19,0))) AS BIGINT), 0) AS sample_card
      |  FROM ca JOIN cb USING (k))
      |SELECT n_rows, exact_card AS exact_join_card,
      |  sample_card AS sample_join_card,
      |  CAST(sample_card * 100 AS BIGINT) AS estimate,
      |  ROUND(100.0 * abs(CAST(sample_card * 100 AS DOUBLE) -
      |    CAST(exact_card AS DOUBLE)) / CAST(exact_card AS DOUBLE), 6)
      |    AS rel_err_pct
      |FROM ex CROSS JOIN sm""".stripMargin

  // --------------------------------------------------------------------------
  // Degree-distribution tail index
  // --------------------------------------------------------------------------

  /** Hill tail index of the co-purchase DEGREE distribution
    * ([[graft.metrics.LongTail.hillTailIndex]] over edge endpoints, k=50) —
    * the scale-free-ness test that explains q_percolation's result: a
    * heavy-tailed degree distribution (α̂ ≈ 1-2) predicts hub-fragility, a
    * thin tail predicts the robustness we measured.
    */
  def qDegreeTail(spark: SparkSession, dir: String): DataFrame = {
    val e = InsightQueries.repeatEdges(spark, dir)
    val endpoints = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
    graft.metrics.LongTail.hillTailIndex(endpoints, "node", k = 50)
  }

  val degreeTailSql: String =
    s"""WITH ${InsightQueries.repeatEdgesSql},
      |ep AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
      |c AS (SELECT node, COUNT(*) AS volume FROM ep GROUP BY 1),
      |r AS (SELECT node, volume,
      |    ROW_NUMBER() OVER (ORDER BY volume DESC, node) AS rnk FROM c),
      |tl AS (SELECT volume AS x_kplus1 FROM r WHERE rnk = 51),
      |s AS (SELECT SUM(CAST(ln(CAST(r.volume AS DOUBLE) / tl.x_kplus1)
      |      AS DECIMAL(18,8))) AS sl
      |  FROM r CROSS JOIN tl WHERE rnk <= 50)
      |SELECT 50 AS k, x_kplus1,
      |  ROUND(CAST(sl AS DOUBLE), 6) AS sum_log,
      |  ROUND(50 / CAST(sl AS DOUBLE), 6) AS hill_alpha
      |FROM s CROSS JOIN tl""".stripMargin

  // --------------------------------------------------------------------------
  // Leaderboard turnover
  // --------------------------------------------------------------------------

  /** Day-over-day Jaccard of the daily top-10 most-active users
    * ([[graft.ext.RankCompare.topKTurnover]]) — the leaderboard-volatility
    * series; q_rbo compares one ranking pair, this monitors set stability
    * over time.
    */
  def qRankChurn(spark: SparkSession, dir: String): DataFrame =
    graft.ext.RankCompare.topKTurnover(Tables.events(spark, dir),
        dayCol = to_date(col("ts")), keyCol = "user_id", k = 10)
      .select(col("day"), col("n_common"),
        round(col("jaccard"), 6).as("jaccard"))

  val rankChurnSql: String =
    """WITH counts AS (SELECT CAST(ts AS DATE) AS day, user_id AS key,
      |    COUNT(*) AS n FROM events GROUP BY 1, 2),
      |top AS (SELECT day, key FROM (SELECT day, key,
      |    ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, key) AS rk
      |  FROM counts) WHERE rk <= 10),
      |prev AS (SELECT day + 1 AS day, key FROM top),
      |common AS (SELECT day, COUNT(*) AS n_common FROM top
      |  JOIN prev USING (day, key) GROUP BY 1),
      |sizes AS (SELECT day, COUNT(*) AS sz FROM top GROUP BY 1),
      |psizes AS (SELECT day + 1 AS day, sz AS psz FROM sizes),
      |days AS (SELECT DISTINCT day FROM top),
      |spine AS (SELECT d.day FROM days d
      |  JOIN (SELECT day + 1 AS day FROM days) p USING (day))
      |SELECT spine.day, COALESCE(n_common, 0) AS n_common,
      |  ROUND(CAST(COALESCE(n_common, 0) AS DOUBLE) /
      |    CAST(sz + psz - COALESCE(n_common, 0) AS DOUBLE), 6) AS jaccard
      |FROM spine LEFT JOIN common USING (day)
      |JOIN sizes USING (day) JOIN psizes USING (day) ORDER BY day""".stripMargin

  // --------------------------------------------------------------------------
  // Fisher ideal price index
  // --------------------------------------------------------------------------

  /** Completes q_price_index's index-number family: matched-basket
    * Laspeyres (base-quantity weights, overstates inflation under
    * substitution), Paasche (current-quantity weights, understates), and
    * the Fisher ideal index √(L·P) with the L−P substitution gap — the
    * classic Diewert superlative-index triple over monthly order data.
    * Same exactness shape as q_price_index: exact long quantities/cents,
    * per-part terms DECIMAL(28,12)-quantized, Paasche numerator an exact
    * cents sum.
    */
  def qFisherIndex(spark: SparkSession, dir: String): DataFrame = {
    val pm = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("part"),
        trunc(col("o_orderdate"), "month").as("month"),
        col("l_quantity").cast("long").as("qv"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .groupBy(col("part"), col("month"))
      .agg(sum(col("qv")).as("q"), sum(col("cents")).as("c"))
    val baseMonth = pm.agg(min(col("month")).as("base_month"))
    val basePm = pm.crossJoin(broadcast(baseMonth))
      .filter(col("month") === col("base_month"))
      .select(col("part"), col("q").as("q0"), col("c").as("c0"))
    val agg = pm.join(basePm, "part")
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_parts"),
        sum((col("q0") * (col("c").cast("double") / col("q")))
          .cast("decimal(28,12)")).as("lnum"),
        sum((col("q0") * (col("c0").cast("double") / col("q0")))
          .cast("decimal(28,12)")).as("lden"),
        sum(col("c")).as("pnum"),
        sum((col("q") * (col("c0").cast("double") / col("q0")))
          .cast("decimal(28,12)")).as("pden"))
    val l = col("lnum").cast("double") / col("lden").cast("double")
    val p = col("pnum").cast("double") / col("pden").cast("double")
    agg.select(col("month"), col("n_parts"),
        round(l, 6).as("laspeyres"), round(p, 6).as("paasche"),
        round(sqrt(l * p), 6).as("fisher"),
        round(l - p, 6).as("substitution_gap"))
      .orderBy(col("month"))
  }

  val fisherIndexSql: String =
    """WITH pm AS (SELECT l_partkey AS part,
      |    date_trunc('month', o_orderdate) AS month,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
      |    CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |bm AS (SELECT MIN(month) AS base_month FROM pm),
      |base AS (SELECT part, q AS q0, c AS c0 FROM pm CROSS JOIN bm
      |  WHERE month = base_month),
      |agg AS (SELECT month, COUNT(*) AS n_parts,
      |    SUM(CAST(q0 * (CAST(c AS DOUBLE) / q) AS DECIMAL(28,12))) AS lnum,
      |    SUM(CAST(q0 * (CAST(c0 AS DOUBLE) / q0) AS DECIMAL(28,12)))
      |      AS lden,
      |    CAST(SUM(c) AS BIGINT) AS pnum,
      |    SUM(CAST(q * (CAST(c0 AS DOUBLE) / q0) AS DECIMAL(28,12))) AS pden
      |  FROM pm JOIN base USING (part) GROUP BY 1)
      |SELECT month, n_parts,
      |  ROUND(CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE), 6) AS laspeyres,
      |  ROUND(CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE), 6) AS paasche,
      |  ROUND(sqrt((CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE)) *
      |    (CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE))), 6) AS fisher,
      |  ROUND(CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE) -
      |    CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE), 6)
      |    AS substitution_gap
      |FROM agg ORDER BY month""".stripMargin

  // --------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_spearman" -> (qSpearman _),
    "q_cramers_v" -> (qCramersV _),
    "q_delta_method" -> (qDeltaMethod _),
    "q_periodogram" -> (qPeriodogram _),
    "q_oov_rate" -> (qOovRate _),
    "q_freshness" -> (qFreshness _),
    "q_cms_sketch" -> (qCmsSketch _),
    "q_hll_estimate" -> (qHllEstimate _),
    "q_welch_ttest" -> (qWelchTtest _),
    "q_gumbel_levels" -> (qGumbelLevels _),
    "q_trigram_nll" -> (qTrigramNll _),
    "q_kmeans_iters" -> (qKmeansIters _),
    "q_hll_grouped" -> (qHllGrouped _),
    "q_modularity" -> (qModularity _),
    "q_ess_weights" -> (qEssWeights _),
    "q_ucb_scores" -> (qUcbScores _),
    "q_bcubed" -> (qBcubed _),
    "q_ari" -> (qAri _),
    "q_heldout_nll" -> (qHeldoutNll _),
    "q_kn_bigram_nll" -> (qKnBigramNll _),
    "q_dp_sensitivity" -> (qDpSensitivity _),
    "q_hashed_topk" -> (qHashedTopk _),
    "q_post_stratified" -> (qPostStratified _),
    "q_tail_dependence" -> (qTailDependence _),
    "q_naive_backtest" -> (qNaiveBacktest _),
    "q_hist_quantiles" -> (qHistQuantiles _),
    "q_zonemap_skip" -> (qZonemapSkip _),
    "q_langid_confusion" -> (qLangidConfusion _),
    "q_percolation" -> (qPercolation _),
    "q_join_card_sample" -> (qJoinCardSample _),
    "q_degree_tail" -> (qDegreeTail _),
    "q_rank_churn" -> (qRankChurn _),
    "q_fisher_index" -> (qFisherIndex _))

  val oracleSql: Map[String, String] = Map(
    "q_spearman" -> spearmanSql,
    "q_cramers_v" -> cramersVSql,
    "q_delta_method" -> deltaMethodSql,
    "q_periodogram" -> periodogramSql,
    "q_oov_rate" -> oovRateSql,
    "q_freshness" -> freshnessSql,
    "q_cms_sketch" -> cmsSketchSql,
    "q_hll_estimate" -> hllEstimateSql,
    "q_welch_ttest" -> welchTtestSql,
    "q_gumbel_levels" -> gumbelLevelsSql,
    "q_trigram_nll" -> trigramNllSql,
    "q_kmeans_iters" -> kmeansItersSql,
    "q_hll_grouped" -> hllGroupedSql,
    "q_modularity" -> modularitySql,
    "q_ess_weights" -> essWeightsSql,
    "q_ucb_scores" -> ucbScoresSql,
    "q_bcubed" -> bcubedSql,
    "q_ari" -> ariSql,
    "q_heldout_nll" -> heldoutNllSql,
    "q_kn_bigram_nll" -> knBigramNllSql,
    "q_dp_sensitivity" -> dpSensitivitySql,
    "q_hashed_topk" -> hashedTopkSql,
    "q_post_stratified" -> postStratifiedSql,
    "q_tail_dependence" -> tailDependenceSql,
    "q_naive_backtest" -> naiveBacktestSql,
    "q_hist_quantiles" -> histQuantilesSql,
    "q_zonemap_skip" -> zonemapSkipSql,
    "q_langid_confusion" -> langidConfusionSql,
    "q_percolation" -> percolationSql,
    "q_join_card_sample" -> joinCardSampleSql,
    "q_degree_tail" -> degreeTailSql,
    "q_rank_churn" -> rankChurnSql,
    "q_fisher_index" -> fisherIndexSql)
}
