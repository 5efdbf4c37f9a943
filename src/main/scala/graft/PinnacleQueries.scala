package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{ChangeDetect, Experiment, Mixing}
import graft.metrics.{LongTail, RankingMetrics}

/** Round-8 batch #4: cascade ranking quality (ERR), heavy-tail quantification
  * (Hill estimator), nonparametric trend detection (Mann–Kendall), mixture
  * budgeting (UniMax waterfill + data-constrained effective data), and
  * multi-rater reliability (Krippendorff's alpha). Every oracle mirrors the
  * Spark arithmetic shapes exactly — integer/DECIMAL sums with one final
  * double division — so results hash-match at sf0.01 and sf0.1.
  */
object PinnacleQueries {

  // --------------------------------------------------------------------------
  // Expected reciprocal rank — cascade-model ranking quality
  // --------------------------------------------------------------------------

  /** ERR@10 of the urgent-order recommendations vs finalized-order sales
    * ([[RankingMetrics.errAtK]]) — unlike q_mrr, later hits are discounted by
    * the probability the user already stopped at an earlier hit.
    */
  def qErrRank(spark: SparkSession, dir: String): DataFrame =
    RankingMetrics.errAtK(SparkEntry.recommendations(spark, dir),
        SparkEntry.sales(spark, dir), "user_id", "item_id", k = 10)
      .orderBy(col("user"))

  val errRankSql: String =
    s"""WITH ${SparkEntry.salesSql},
      |${SparkEntry.recsSql},
      |rc AS (SELECT user_id, item_id, COUNT(*) AS n FROM recs GROUP BY 1, 2),
      |rk AS (SELECT user_id, item_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, item_id)
      |      AS rnk FROM rc QUALIFY rnk <= 10),
      |a AS (SELECT DISTINCT user_id, item_id FROM sales),
      |f AS (SELECT rk.user_id, rnk,
      |    CASE WHEN a.item_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      |  FROM rk LEFT JOIN a
      |    ON rk.user_id = a.user_id AND rk.item_id = a.item_id),
      |t AS (SELECT user_id, rnk, hit,
      |    COALESCE(SUM(hit) OVER (PARTITION BY user_id ORDER BY rnk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS hb
      |  FROM f)
      |SELECT user_id AS "user", CAST(SUM(hit) AS BIGINT) AS n_hits_at_k,
      |  ROUND(CAST(SUM(CASE WHEN hit = 1
      |      THEN CAST(power(0.5, hb + 1) / rnk AS DECIMAL(18,8))
      |      ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE), 6) AS err
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Hill tail-index — power-law exponent of item popularity
  // --------------------------------------------------------------------------

  /** Hill estimator (k = 100) of the item-popularity tail exponent over
    * lineitem part volume ([[LongTail.hillTailIndex]]) — the scalar that says
    * whether q_long_tail's curve is blockbuster-dominated (α̂ ≈ 1) or
    * thin-tailed.
    */
  def qHillTail(spark: SparkSession, dir: String): DataFrame =
    LongTail.hillTailIndex(Tables.lineitem(spark, dir), "l_partkey", k = 100)

  val hillTailSql: String =
    """WITH c AS (SELECT l_partkey, COUNT(*) AS volume FROM lineitem GROUP BY 1),
      |r AS (SELECT l_partkey, volume,
      |    ROW_NUMBER() OVER (ORDER BY volume DESC, l_partkey) AS rnk FROM c),
      |tl AS (SELECT volume AS x_kplus1 FROM r WHERE rnk = 101),
      |s AS (SELECT SUM(CAST(ln(CAST(r.volume AS DOUBLE) / tl.x_kplus1)
      |      AS DECIMAL(18,8))) AS sl
      |  FROM r CROSS JOIN tl WHERE rnk <= 100)
      |SELECT 100 AS k, x_kplus1,
      |  ROUND(CAST(sl AS DOUBLE), 6) AS sum_log,
      |  ROUND(100 / CAST(sl AS DOUBLE), 6) AS hill_alpha
      |FROM s CROSS JOIN tl""".stripMargin

  // --------------------------------------------------------------------------
  // Mann–Kendall trend test — nonparametric per-feed trend gate
  // --------------------------------------------------------------------------

  /** Mann–Kendall trend test per event_type over the daily micro-unit value
    * sum ([[ChangeDetect.mannKendall]]) — the distribution-free companion to
    * q_theil_sen's slope and q_cusum's level-shift alarm.
    */
  def qMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vm")).as("v"))
    ChangeDetect.mannKendall(daily, "event_type", "day", "v")
      .orderBy(col("event_type"))
  }

  val mannKendallSql: String =
    """WITH dly AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS HUGEINT) AS v
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT a.g, CAST(SUM(CASE WHEN b.v > a.v THEN 1
      |      WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM dly a JOIN dly b ON a.g = b.g AND a.d < b.d GROUP BY 1),
      |tt AS (SELECT g, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
      |      AS tie_term
      |  FROM (SELECT g, v, COUNT(*) AS t FROM dly GROUP BY 1, 2) GROUP BY 1),
      |n AS (SELECT g, COUNT(*) AS n_days FROM dly GROUP BY 1),
      |f AS (SELECT n.g, n_days, s_stat,
      |    CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE)
      |      / 18.0 AS var_s
      |  FROM n JOIN s USING (g) JOIN tt USING (g)),
      |z AS (SELECT g, n_days, s_stat, var_s,
      |    CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
      |         WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
      |         ELSE 0.0 END AS z_stat FROM f)
      |SELECT g AS event_type, n_days, s_stat,
      |  ROUND(var_s, 6) AS var_s, ROUND(z_stat, 6) AS z_stat,
      |  CASE WHEN z_stat > 1.96 THEN 'increasing'
      |       WHEN z_stat < -1.96 THEN 'decreasing'
      |       ELSE 'none' END AS trend
      |FROM z ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // UniMax budget allocation + data-constrained effective data
  // --------------------------------------------------------------------------

  private val UnimaxEpochCap = 2

  /** The token budget is 2× the corpus's total chars — sized so the epoch-2
    * cap binds on the small sources while the large ones sit on the common
    * waterline (a genuinely mixed capped/uncapped solution at every sf). One
    * scalar collect (the corpus total) — O(1) driver traffic.
    */
  private def unimaxBudget(spark: SparkSession, dir: String): Long =
    2L * Tables.documents(spark, dir)
      .agg(sum(col("n_chars")).cast("long")).head.getLong(0)

  /** UniMax waterfill of a 2×-corpus token budget across sources at epoch cap
    * 2 ([[Mixing.unimaxAllocation]]) — the epoch-capped alternative to
    * q_mix_weights' temperature sampling.
    */
  def qUnimaxAlloc(spark: SparkSession, dir: String): DataFrame =
    Mixing.unimaxAllocation(Tables.documents(spark, dir), "source", "n_chars",
        budget = unimaxBudget(spark, dir), epochCap = UnimaxEpochCap)
      .orderBy(col("source"))

  /** CTE chain ending in `f(source, n_tokens, cap, is_capped, n, r_star,
    * capped_sum, b)` — the waterfill solved in SQL, shared by the allocation
    * and effective-data oracles.
    */
  private val unimaxCtesSql: String =
    s"""s AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT 2 * CAST(SUM(n_tokens) AS BIGINT) AS b FROM s),
      |c AS (SELECT source, n_tokens,
      |    n_tokens * $UnimaxEpochCap AS cap FROM s),
      |r AS (SELECT source, n_tokens, cap,
      |    ROW_NUMBER() OVER (ORDER BY cap, source) AS r,
      |    CAST(SUM(cap) OVER (ORDER BY cap, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS prefix,
      |    COUNT(*) OVER () AS n FROM c),
      |g AS (SELECT r.*, b,
      |    cap * (n - r + 1) <= b - (prefix - cap) AS is_capped
      |  FROM r CROSS JOIN tot),
      |rs AS (SELECT COALESCE(MAX(CASE WHEN is_capped THEN r END), 0) AS r_star,
      |    COALESCE(MAX(CASE WHEN is_capped THEN prefix END), CAST(0 AS BIGINT))
      |      AS capped_sum FROM g),
      |f AS (SELECT g.*, r_star, capped_sum,
      |    CASE WHEN is_capped THEN CAST(cap AS DOUBLE)
      |         ELSE CAST(b - capped_sum AS DOUBLE) / (n - r_star) END AS alloc
      |  FROM g CROSS JOIN rs)""".stripMargin

  val unimaxAllocSql: String =
    s"""WITH $unimaxCtesSql
      |SELECT source, n_tokens, cap, is_capped,
      |  ROUND(alloc, 6) AS allocated,
      |  ROUND(alloc / n_tokens, 6) AS epochs
      |FROM f ORDER BY source""".stripMargin

  private val RStar = 15.4

  /** Effective data of the UniMax allocation under the data-constrained
    * scaling law ([[Mixing.effectiveData]], Muennighoff et al. 2023): how much
    * of each source's allocated budget buys new learning once repeats decay.
    */
  def qDataConstrained(spark: SparkSession, dir: String): DataFrame =
    Mixing.effectiveData(
        Mixing.unimaxAllocation(Tables.documents(spark, dir), "source",
          "n_chars", budget = unimaxBudget(spark, dir),
          epochCap = UnimaxEpochCap),
        "source", "n_tokens", "allocated", rStar = RStar)
      .orderBy(col("source"))

  val dataConstrainedSql: String =
    s"""WITH $unimaxCtesSql,
      |al AS (SELECT source, n_tokens, ROUND(alloc, 6) AS allocated FROM f),
      |e AS (SELECT source, n_tokens, allocated,
      |    GREATEST(allocated / n_tokens - 1.0, 0.0) AS rp,
      |    CASE WHEN allocated <= n_tokens THEN allocated
      |         ELSE n_tokens + n_tokens * $RStar *
      |           (1.0 - exp(-GREATEST(allocated / n_tokens - 1.0, 0.0)
      |             / $RStar)) END AS eff
      |  FROM al)
      |SELECT source, n_tokens, allocated,
      |  ROUND(rp, 6) AS repeats, ROUND(eff, 6) AS effective,
      |  ROUND(eff / allocated, 6) AS efficiency
      |FROM e ORDER BY source""".stripMargin

  // --------------------------------------------------------------------------
  // Krippendorff's alpha — multi-rater label reliability
  // --------------------------------------------------------------------------

  /** Krippendorff's alpha over three deterministic "annotators" labeling each
    * document long/short at slightly different n_chars thresholds (300 / 290 /
    * 310), the third rating only doc_id % 3 ≠ 0 — so units have 2 or 3
    * ratings, exercising the missing-data path 2-rater kappa
    * (q_cohens_kappa) can't ([[Experiment.krippendorffAlpha]]).
    */
  def qKrippAlpha(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    def rate(threshold: Int) =
      when(col("n_chars") > threshold, lit("long")).otherwise(lit("short"))
        .as("label")
    val ratings = d.select(col("doc_id").as("u"), rate(300))
      .union(d.select(col("doc_id").as("u"), rate(290)))
      .union(d.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("u"), rate(310)))
    Experiment.krippendorffAlpha(ratings, "u", "label", maxRaters = 3)
  }

  val krippAlphaSql: String =
    """WITH rat AS (
      |  SELECT doc_id AS u, CASE WHEN n_chars > 300 THEN 'long' ELSE 'short'
      |    END AS label FROM documents
      |  UNION ALL
      |  SELECT doc_id, CASE WHEN n_chars > 290 THEN 'long' ELSE 'short' END
      |    FROM documents
      |  UNION ALL
      |  SELECT doc_id, CASE WHEN n_chars > 310 THEN 'long' ELSE 'short' END
      |    FROM documents WHERE doc_id % 3 <> 0),
      |ouc AS (SELECT u, label AS c, COUNT(*) AS o FROM rat GROUP BY 1, 2),
      |nu AS (SELECT u, CAST(SUM(o) AS BIGINT) AS n_u FROM ouc GROUP BY 1
      |  HAVING SUM(o) >= 2),
      |p AS (SELECT ouc.u, ouc.c, ouc.o, nu.n_u FROM ouc JOIN nu USING (u)),
      |obs AS (SELECT CAST(SUM(o * (n_u - o) * (2 // (n_u - 1))) AS BIGINT)
      |    AS num_scaled FROM p),
      |tt AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n,
      |    CAST(SUM(n_c * n_c) AS BIGINT) AS s_nc2
      |  FROM (SELECT c, SUM(o) AS n_c FROM p GROUP BY 1)),
      |un AS (SELECT COUNT(*) AS n_units_pairable FROM nu)
      |SELECT n_units_pairable, n AS n_ratings,
      |  ROUND(CAST(num_scaled AS DOUBLE) / (2 * n), 6) AS d_o,
      |  ROUND(CAST(n * n - s_nc2 AS DOUBLE) / (n * (n - 1)), 6) AS d_e,
      |  ROUND(1.0 - CAST((n - 1) * num_scaled AS DOUBLE) /
      |    CAST(2 * (n * n - s_nc2) AS DOUBLE), 6) AS alpha
      |FROM un CROSS JOIN obs CROSS JOIN tt""".stripMargin

  // --------------------------------------------------------------------------
  // Winsorized mean — clamping robust location per brand
  // --------------------------------------------------------------------------

  /** 10%-winsorized mean of per-brand line price in cents
    * ([[graft.ext.Profiling.winsorizedMean]]) — the clamping counterpart of
    * q_trimmed_mean (tails replaced by the boundary order statistics, not
    * dropped). Rank-based and exact end to end.
    */
  def qWinsorized(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"))
    graft.ext.Profiling.winsorizedMean(x, "brand", "cents", "tie",
        pctNum = 1, pctDen = 10)
      .orderBy(col("brand"))
  }

  val winsorizedSql: String =
    """WITH x AS (SELECT p_brand AS brand,
      |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
      |    l_orderkey * 8 + l_linenumber AS tie
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |r AS (SELECT brand, v,
      |    ROW_NUMBER() OVER (PARTITION BY brand ORDER BY v, tie) AS rn,
      |    COUNT(*) OVER (PARTITION BY brand) AS n FROM x),
      |b AS (SELECT brand, MAX(n) AS n,
      |    MAX(CASE WHEN rn = n // 10 + 1 THEN v END) AS lo_bound,
      |    MAX(CASE WHEN rn = n - n // 10 THEN v END) AS hi_bound
      |  FROM r GROUP BY 1)
      |SELECT r.brand, b.n, b.lo_bound, b.hi_bound,
      |  ROUND(CAST(CAST(SUM(GREATEST(LEAST(r.v, b.hi_bound), b.lo_bound))
      |    AS BIGINT) AS DOUBLE) / b.n, 6) AS winsorized_mean
      |FROM r JOIN b USING (brand)
      |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Kendall's tau-b — do revenue and volume rank brands the same way?
  // --------------------------------------------------------------------------

  /** τ-b between the brand ranking by revenue and by unit volume
    * ([[graft.ext.RankCompare.kendallTau]]) — the whole-list agreement
    * complement of q_rbo's top-weighted overlap.
    */
  def qKendallTau(spark: SparkSession, dir: String): DataFrame = {
    val perBrand = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .as("rev_cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
    graft.ext.RankCompare.kendallTau(perBrand, "brand", "rev_cents", "qty")
  }

  val kendallTauSql: String =
    """WITH pb AS (SELECT p_brand AS brand,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS x,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      |pr AS (SELECT
      |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END *
      |    CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS cd,
      |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
      |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      |  FROM pb a JOIN pb b ON a.brand < b.brand),
      |n AS (SELECT COUNT(*) AS n_keys FROM pb),
      |ag AS (SELECT
      |    CAST(COALESCE(SUM(CASE WHEN cd = 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |      AS n_concordant,
      |    CAST(COALESCE(SUM(CASE WHEN cd = -1 THEN 1 ELSE 0 END), 0)
      |      AS BIGINT) AS n_discordant,
      |    CAST(COALESCE(SUM(tx), 0) AS BIGINT) AS n_tied_x,
      |    CAST(COALESCE(SUM(ty), 0) AS BIGINT) AS n_tied_y
      |  FROM pr)
      |SELECT n_keys, n_concordant, n_discordant, n_tied_x, n_tied_y,
      |  ROUND(CAST(n_concordant - n_discordant AS DOUBLE) /
      |    sqrt(CAST((n_keys * (n_keys - 1) // 2 - n_tied_x) *
      |      (n_keys * (n_keys - 1) // 2 - n_tied_y) AS DOUBLE)), 6) AS tau_b
      |FROM n CROSS JOIN ag""".stripMargin

  // --------------------------------------------------------------------------
  // Ljung–Box whiteness test over the daily-revenue ACF
  // --------------------------------------------------------------------------

  /** Ljung–Box Q over lags 1..10 of the daily order-revenue series
    * ([[graft.ext.Series.ljungBox]]) — the one-number "any autocorrelation
    * left?" gate over the same series q_acf resolves per lag.
    */
  def qLjungBox(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(AnalyticsQueries.dec(col("o_totalprice"))).as("x"))
    graft.ext.Series.ljungBox(d, "day", "x", maxLag = 10)
  }

  val ljungBoxSql: String =
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS HUGEINT) AS x
      |  FROM orders GROUP BY 1),
      |l AS (SELECT unnest(generate_series(1, 10)) AS lag),
      |s AS (SELECT l.lag, d.day + CAST(l.lag AS INTEGER) AS tday, d.x AS xs
      |  FROM d CROSS JOIN l),
      |p AS (SELECT s.lag, t.x AS y, s.xs AS x FROM d t JOIN s ON t.day = s.tday),
      |m AS (SELECT lag, COUNT(*) AS n_pairs,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM p GROUP BY 1),
      |rho AS (SELECT lag,
      |  ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
      |  FROM m),
      |nn AS (SELECT COUNT(*) AS n_obs FROM d),
      |t AS (SELECT n_obs,
      |    CAST((acf * acf) / (n_obs - lag) AS DECIMAL(18,8)) AS term
      |  FROM rho CROSS JOIN nn)
      |SELECT n_obs, CAST(10 AS BIGINT) AS max_lag,
      |  ROUND(CAST(n_obs * (n_obs + 2) AS DOUBLE) *
      |    CAST(SUM(term) AS DOUBLE), 6) AS q_stat,
      |  1.8307038053275146E1 AS chi2_crit_95,
      |  CAST(n_obs * (n_obs + 2) AS DOUBLE) * CAST(SUM(term) AS DOUBLE)
      |    > 1.8307038053275146E1 AS reject_white
      |FROM t GROUP BY n_obs""".stripMargin

  // --------------------------------------------------------------------------
  // Wald–Wolfowitz runs test — sign-sequence randomness per event feed
  // --------------------------------------------------------------------------

  /** Runs test per event_type over the daily micro-unit value sums
    * ([[graft.ext.Runs.runsTest]]) — too few runs = regime clumping, too
    * many = oscillation; the sequence-structure companion to q_mann_kendall.
    */
  def qRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vm")).as("v"))
    graft.ext.Runs.runsTest(daily, "event_type", "day", "v")
      .orderBy(col("event_type"))
  }

  val runsTestSql: String =
    """WITH dly AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS HUGEINT) AS v
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT g, COUNT(*) AS n, SUM(v) AS sv FROM dly GROUP BY 1),
      |sg AS (SELECT dly.g, d,
      |    CASE WHEN v * n > sv THEN 1 WHEN v * n < sv THEN -1 END AS sign
      |  FROM dly JOIN m USING (g)),
      |sgn AS (SELECT g, d, sign FROM sg WHERE sign IS NOT NULL),
      |r AS (SELECT g, sign,
      |    CASE WHEN LAG(sign) OVER (PARTITION BY g ORDER BY d) IS NULL
      |      OR sign <> LAG(sign) OVER (PARTITION BY g ORDER BY d)
      |      THEN 1 ELSE 0 END AS nw
      |  FROM sgn),
      |c AS (SELECT g,
      |    CAST(SUM(CASE WHEN sign = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
      |    CAST(SUM(CASE WHEN sign = -1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_down,
      |    CAST(SUM(nw) AS BIGINT) AS n_runs FROM r GROUP BY 1),
      |f AS (SELECT g, n_up, n_down, n_runs,
      |    CAST(n_up * n_down * 2 AS DOUBLE) AS p2,
      |    CAST(n_up + n_down AS DOUBLE) AS n FROM c)
      |SELECT g AS event_type, n_up, n_down, n_runs,
      |  ROUND(1.0 + p2 / n, 6) AS e_runs,
      |  ROUND((n_runs - (1.0 + p2 / n)) /
      |    sqrt(CASE WHEN p2 * (p2 - n) / (n * n * (n - 1)) > 0.0
      |      THEN p2 * (p2 - n) / (n * n * (n - 1)) END), 6) AS z_stat
      |FROM f ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // BM25 ranked retrieval
  // --------------------------------------------------------------------------

  /** BM25 top-20 for the query {hash, join, scan} over documents
    * ([[graft.ext.Bm25.bm25TopK]]) — the ranked-retrieval complement of the
    * boolean q_keyword_and.
    */
  def qBm25(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Bm25.bm25TopK(Tables.documents(spark, dir), "doc_id", "text",
      terms = Seq("hash", "join", "scan"), k1 = 1.2, b = 0.75, topK = 20)

  val bm25Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |corpus AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS t_toks
      |  FROM dl),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      |  WHERE tok IN ('hash', 'join', 'scan') GROUP BY 1, 2),
      |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      |sc AS (SELECT tf.doc_id,
      |    CAST(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
      |      (tf * (1.2 + 1.0)) /
      |      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
      |        (CAST(t_toks AS DOUBLE) / n_docs))) AS DECIMAL(18,8)) AS ts
      |  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id)
      |  CROSS JOIN corpus),
      |agg AS (SELECT doc_id, COUNT(*) AS n_terms_hit,
      |    ROUND(CAST(SUM(ts) AS DOUBLE), 6) AS score FROM sc GROUP BY 1),
      |top AS (SELECT * FROM agg ORDER BY score DESC, doc_id LIMIT 20)
      |SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank,
      |  doc_id, n_terms_hit, score
      |FROM top ORDER BY rank""".stripMargin

  // --------------------------------------------------------------------------
  // Holt linear forecast
  // --------------------------------------------------------------------------

  /** Holt linear smoothing (α=0.5, β=0.25) per event_type over the daily
    * micro-unit value sums ([[graft.ext.Forecast.holtLinear]]): final
    * level/trend state, next-day forecast, and the one-step-ahead MAE — the
    * expectation q_cusum's alarms are measured against. The oracle replays
    * the fold day by day with a recursive CTE (the q_cusum pattern).
    */
  def qHoltLinear(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vm")).as("v"))
      // back to original units: level ≈ daily value keeps |x| ≪ 1e9, where
      // ROUND(x, 6) is still ulp-stable across engines (verify-skill gotcha)
      .select(col("event_type"), col("day"),
        (col("v").cast("double") / 1e6).as("x"))
    graft.ext.Forecast.holtLinear(daily, "event_type", "day", "x",
        alpha = 0.5, beta = 0.25)
      .select(col("event_type"), col("n_days"),
        round(col("level"), 6).as("level"), round(col("trend"), 6).as("trend"),
        round(col("forecast_next"), 6).as("forecast_next"),
        round(col("mae"), 6).as("mae"))
      .orderBy(col("event_type"))
  }

  val holtLinearSql: String =
    """WITH RECURSIVE dly AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS HUGEINT) AS v
      |  FROM events GROUP BY 1, 2),
      |z AS (SELECT g, d, CAST(v AS DOUBLE) / 1000000.0 AS x,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS rn FROM dly),
      |f(g, rn, l, b, sae) AS (
      |  SELECT z2.g, CAST(2 AS BIGINT), z2.x, z2.x - z1.x,
      |    CAST(0.0 AS DOUBLE)
      |  FROM z z2 JOIN z z1 ON z1.g = z2.g AND z1.rn = 1 WHERE z2.rn = 2
      |  UNION ALL
      |  SELECT z.g, z.rn,
      |    0.5 * z.x + 0.5 * (f.l + f.b),
      |    0.25 * (0.5 * z.x + 0.5 * (f.l + f.b) - f.l) + 0.75 * f.b,
      |    f.sae + abs(z.x - (f.l + f.b))
      |  FROM f JOIN z ON z.g = f.g AND z.rn = f.rn + 1),
      |fin AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g ORDER BY rn DESC)
      |    AS rr FROM f)
      |SELECT g AS event_type, rn AS n_days,
      |  ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
      |  ROUND(l + b, 6) AS forecast_next,
      |  ROUND(sae / (rn - 2), 6) AS mae
      |FROM fin WHERE rr = 1 AND rn >= 3 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Optimal single changepoint (binary segmentation, step 1)
  // --------------------------------------------------------------------------

  /** Best single split per event_type over the daily micro-unit value sums
    * ([[ChangeDetect.bestSplit]]) — the retrospective "WHERE did the level
    * shift?" breakpoint next to q_cusum's sequential alarm; means reported in
    * original units.
    */
  def qBestSplit(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vm")).as("v"))
    ChangeDetect.bestSplit(daily, "event_type", "day", "v", unitScale = 1e6)
      .orderBy(col("event_type"))
  }

  val bestSplitSql: String =
    """WITH dly AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS HUGEINT) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT g, d, v,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS k,
      |    CAST(SUM(v) OVER (PARTITION BY g ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
      |      AS p,
      |    COUNT(*) OVER (PARTITION BY g) AS n,
      |    CAST(SUM(v) OVER (PARTITION BY g) AS HUGEINT) AS s
      |  FROM dly),
      |sc AS (SELECT g, d, k, n, p, s,
      |    CAST(p AS DOUBLE) * CAST(p AS DOUBLE) / k +
      |      (CAST(s AS DOUBLE) - CAST(p AS DOUBLE)) *
      |      (CAST(s AS DOUBLE) - CAST(p AS DOUBLE)) / (n - k) AS score
      |  FROM b WHERE k < n),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
      |    ORDER BY score DESC, d) AS rr FROM sc)
      |SELECT g AS event_type, n AS n_days, d AS split_day, k AS n_left,
      |  ROUND(CAST(p AS DOUBLE) / k / 1000000.0, 6) AS mean_left,
      |  ROUND((CAST(s AS DOUBLE) - CAST(p AS DOUBLE)) / (n - k)
      |    / 1000000.0, 6) AS mean_right,
      |  ROUND((CAST(s AS DOUBLE) - CAST(p AS DOUBLE)) / (n - k) / 1000000.0
      |    - CAST(p AS DOUBLE) / k / 1000000.0, 6) AS shift
      |FROM r WHERE rr = 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Weighted median
  // --------------------------------------------------------------------------

  /** Quantity-weighted median line price (cents) per brand
    * ([[graft.ext.Profiling.weightedMedian]]) — the typical UNIT's price, vs
    * the typical row's; exact integer `2·cumw ≥ W` rule, no interpolation.
    */
  def qWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"))
    graft.ext.Profiling.weightedMedian(x, "brand", "cents", "qty", "tie")
      .orderBy(col("brand"))
  }

  val weightedMedianSql: String =
    """WITH x AS (SELECT p_brand AS brand,
      |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(l_quantity AS BIGINT) AS wt,
      |    l_orderkey * 8 + l_linenumber AS tie
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |c AS (SELECT brand, v, tie,
      |    CAST(SUM(wt) OVER (PARTITION BY brand ORDER BY v, tie
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumw,
      |    COUNT(*) OVER (PARTITION BY brand) AS n,
      |    CAST(SUM(wt) OVER (PARTITION BY brand) AS BIGINT) AS tw
      |  FROM x),
      |f AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY brand
      |    ORDER BY cumw, v, tie) AS r
      |  FROM c WHERE cumw * 2 >= tw)
      |SELECT brand, n AS n_rows, tw AS total_weight, v AS w_median
      |FROM f WHERE r = 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // TF-IDF more-like-this
  // --------------------------------------------------------------------------

  /** Top-10 documents by TF-IDF cosine to doc 1
    * ([[graft.ext.Bm25.moreLikeThis]]) — related-items retrieval over the
    * sparse inverted-index join (vs q_semantic_dup's embedding cosine).
    */
  def qMoreLikeThis(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Bm25.moreLikeThis(Tables.documents(spark, dir), "doc_id",
      "text", queryId = 1L, topK = 10)

  val moreLikeThisSql: String =
    """WITH tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM
      |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |     FROM documents) GROUP BY 1, 2),
      |nn AS (SELECT COUNT(*) AS n_docs FROM documents),
      |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      |wts AS (SELECT doc_id, tok,
      |    tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) AS w
      |  FROM tf JOIN dfq USING (tok) CROSS JOIN nn),
      |nr AS (SELECT doc_id,
      |    sqrt(CAST(SUM(CAST(w * w AS DECIMAL(18,8))) AS DOUBLE)) AS nrm
      |  FROM wts GROUP BY 1),
      |qw AS (SELECT tok, w AS qw FROM wts WHERE doc_id = 1),
      |qn AS (SELECT nrm AS qnrm FROM nr WHERE doc_id = 1),
      |dt AS (SELECT w.doc_id, COUNT(*) AS n_shared_terms,
      |    SUM(CAST(w.w * qw.qw AS DECIMAL(18,8))) AS dot
      |  FROM wts w JOIN qw USING (tok) WHERE w.doc_id <> 1 GROUP BY 1),
      |cs AS (SELECT doc_id, n_shared_terms,
      |    ROUND(CAST(dot AS DOUBLE) / (nrm * qnrm), 6) AS cosine
      |  FROM dt JOIN nr USING (doc_id) CROSS JOIN qn),
      |top AS (SELECT * FROM cs ORDER BY cosine DESC, doc_id LIMIT 10)
      |SELECT ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rank,
      |  doc_id, n_shared_terms, cosine
      |FROM top ORDER BY rank""".stripMargin

  // --------------------------------------------------------------------------
  // Herfindahl–Hirschman concentration
  // --------------------------------------------------------------------------

  /** Supplier revenue concentration per region: HHI = Σ share² (exact
    * DECIMAL cents² over C²) and the effective supplier count 1/HHI — the
    * market-structure readout next to q_market_share's raw shares and
    * q_gini's inequality curve.
    */
  def qHhi(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("s_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
        .cast("decimal(19,0)").as("c"))
    rev.groupBy(col("region"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("c")).cast("decimal(38,0)").as("__tot"),
        sum(col("c") * col("c")).as("__ss"))
      .select(col("region"), col("n_suppliers"),
        round(col("__ss").cast("double") /
          (col("__tot").cast("double") * col("__tot").cast("double")), 6)
          .as("hhi"),
        round(col("__tot").cast("double") * col("__tot").cast("double") /
          col("__ss").cast("double"), 6).as("effective_n"))
      .orderBy(col("region"))
  }

  val hhiSql: String =
    """WITH rev AS (SELECT r_name AS region, s_suppkey,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      |      AS c
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |m AS (SELECT region, COUNT(*) AS n_suppliers,
      |    SUM(c) AS tot, SUM(c * c) AS ss FROM rev GROUP BY 1)
      |SELECT region, n_suppliers,
      |  ROUND(CAST(ss AS DOUBLE) /
      |    (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi,
      |  ROUND(CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) /
      |    CAST(ss AS DOUBLE), 6) AS effective_n
      |FROM m ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Isotonic calibration (PAVA)
  // --------------------------------------------------------------------------

  /** Isotonic fit of return rate over the discount axis
    * ([[graft.ext.Isotonic.isotonicFit]]) — the monotone calibration curve a
    * serving layer would apply on top of q_score_calibration's reliability
    * diagram. PAVA on the Spark side; the oracle states the same fit through
    * the minimax characterization `max_{k≤i} min_{j≥i} avg(k..j)` — two
    * independent formulations that must agree bit-for-bit.
    */
  def qIsotonic(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(spark, dir)
      .groupBy(lit("all").as("curve"),
        round(col("l_discount") * 100, 0).cast("long").as("x"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("n"))
    graft.ext.Isotonic.isotonicFit(b, "curve", "x", "pos", "n")
      .orderBy(col("x"))
  }

  val isotonicSql: String =
    """WITH b AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos,
      |    COUNT(*) AS n
      |  FROM lineitem GROUP BY 1),
      |o AS (SELECT x, pos, n, ROW_NUMBER() OVER (ORDER BY x) AS i FROM b),
      |pre AS (SELECT i, x, pos, n,
      |    CAST(SUM(pos) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS BIGINT) AS sp,
      |    CAST(SUM(n) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS BIGINT) AS sn
      |  FROM o),
      |a AS (SELECT k.i AS k, j.i AS j,
      |    CAST(j.sp - k.sp + k.pos AS DOUBLE) / (j.sn - k.sn + k.n) AS avgkj
      |  FROM pre k JOIN pre j ON k.i <= j.i),
      |mm AS (SELECT p.i, a.k, MIN(avgkj) AS mn
      |  FROM pre p JOIN a ON a.k <= p.i AND a.j >= p.i GROUP BY 1, 2),
      |fit AS (SELECT i, MAX(mn) AS iso FROM mm GROUP BY 1)
      |SELECT 'all' AS curve, pre.x, pre.pos, pre.n,
      |  ROUND(CAST(pre.pos AS DOUBLE) / pre.n, 6) AS raw_rate,
      |  ROUND(iso, 6) AS iso_rate
      |FROM pre JOIN fit USING (i) ORDER BY pre.x""".stripMargin

  // --------------------------------------------------------------------------
  // Simpson's paradox detector
  // --------------------------------------------------------------------------

  /** Does the discount→return association reverse within brand strata? The
    * aggregation-bias audit (Simpson 1951): the pooled rate difference
    * (high-discount vs low), the per-stratum differences, and how many
    * strata point the OTHER way — plus the stratum-size-weighted within
    * effect (the confounder-adjusted estimate). Arms split at discount ≥ 5%
    * in exact integer percent units; every rate is exact-count derived.
    */
  def qSimpsonParadox(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        (round(col("l_discount") * 100, 0).cast("long") >= 5).as("hi"),
        (col("l_returnflag") === "R").cast("long").as("ret"))
    val byBrand = x.groupBy(col("brand"))
      .agg(sum(when(col("hi"), 1L).otherwise(0L)).as("n_hi"),
        sum(when(col("hi"), col("ret")).otherwise(0L)).as("r_hi"),
        sum(when(!col("hi"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(!col("hi"), col("ret")).otherwise(0L)).as("r_lo"))
      .filter(col("n_hi") > 0 && col("n_lo") > 0)
      .localCheckpoint(eager = true) // overall + per-stratum branches read it
    val diffB = col("r_hi").cast("double") / col("n_hi") -
      col("r_lo").cast("double") / col("n_lo")
    val overall = byBrand.agg(
        sum(col("n_hi")).as("t_nhi"), sum(col("r_hi")).as("t_rhi"),
        sum(col("n_lo")).as("t_nlo"), sum(col("r_lo")).as("t_rlo"))
      .select((col("t_rhi").cast("double") / col("t_nhi") -
        col("t_rlo").cast("double") / col("t_nlo")).as("od"))
    byBrand.crossJoin(broadcast(overall))
      .select(col("od"),
        diffB.as("db"), (col("n_hi") + col("n_lo")).as("w"))
      .agg(count(lit(1)).as("n_strata"),
        round(max(col("od")), 6).as("overall_diff"),
        sum(when(col("db") * col("od") < 0, 1L).otherwise(0L))
          .as("n_opposite"),
        round(sum((col("w") * col("db")).cast("decimal(28,12)"))
          .cast("double") / sum(col("w")), 6).as("weighted_within_diff"))
  }

  val simpsonParadoxSql: String =
    """WITH x AS (SELECT p_brand AS brand,
      |    CAST(ROUND(l_discount * 100) AS BIGINT) >= 5 AS hi,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |bb AS (SELECT brand,
      |    CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |    CAST(SUM(CASE WHEN hi THEN ret ELSE 0 END) AS BIGINT) AS r_hi,
      |    CAST(SUM(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |    CAST(SUM(CASE WHEN NOT hi THEN ret ELSE 0 END) AS BIGINT) AS r_lo
      |  FROM x GROUP BY 1
      |  HAVING SUM(CASE WHEN hi THEN 1 ELSE 0 END) > 0
      |    AND SUM(CASE WHEN NOT hi THEN 1 ELSE 0 END) > 0),
      |ov AS (SELECT CAST(SUM(r_hi) AS DOUBLE) / SUM(n_hi)
      |    - CAST(SUM(r_lo) AS DOUBLE) / SUM(n_lo) AS od FROM bb),
      |d AS (SELECT od,
      |    CAST(r_hi AS DOUBLE) / n_hi - CAST(r_lo AS DOUBLE) / n_lo AS db,
      |    n_hi + n_lo AS w
      |  FROM bb CROSS JOIN ov)
      |SELECT COUNT(*) AS n_strata,
      |  ROUND(MAX(od), 6) AS overall_diff,
      |  CAST(SUM(CASE WHEN db * od < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_opposite,
      |  ROUND(CAST(SUM(CAST(w * db AS DECIMAL(28,12))) AS DOUBLE) /
      |    SUM(w), 6) AS weighted_within_diff
      |FROM d""".stripMargin

  // --------------------------------------------------------------------------
  // Lead–lag cross-correlation
  // --------------------------------------------------------------------------

  /** Cross-correlation of the click and purchase daily value series at lags
    * −7..7 ([[graft.ext.Series.crossCorrelation]]) — "does click volume LEAD
    * purchases?", the two-series companion of q_acf.
    */
  def qXcorr(spark: SparkSession, dir: String): DataFrame = {
    val dly = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vm")).as("v"))
      .localCheckpoint(eager = true) // both series filters read it
    graft.ext.Series.crossCorrelation(
      dly.filter(col("event_type") === "click"),
      dly.filter(col("event_type") === "purchase"),
      "day", "v", "v", maxLag = 7)
  }

  val xcorrSql: String =
    """WITH dly AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS HUGEINT) AS v
      |  FROM events GROUP BY 1, 2),
      |a AS (SELECT d, v AS x FROM dly WHERE g = 'click'),
      |b AS (SELECT d, v AS y FROM dly WHERE g = 'purchase'),
      |l AS (SELECT unnest(generate_series(-7, 7)) AS lag),
      |s AS (SELECT l.lag, a.d + CAST(l.lag AS INTEGER) AS tday, a.x
      |  FROM a CROSS JOIN l),
      |p AS (SELECT s.lag, s.x, b.y FROM s JOIN b ON s.tday = b.d),
      |m AS (SELECT lag, COUNT(*) AS n_pairs,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM p GROUP BY 1)
      |SELECT lag, n_pairs,
      |  ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS xcorr
      |FROM m ORDER BY lag""".stripMargin

  // --------------------------------------------------------------------------
  // Neyman stratified-sample allocation
  // --------------------------------------------------------------------------

  /** Neyman allocation of a 1000-sample audit budget across document sources
    * by n_chars variance ([[Mixing.neymanAllocation]]) — the evaluation-side
    * partner of q_unimax_alloc's training-token waterfill.
    */
  def qNeymanAlloc(spark: SparkSession, dir: String): DataFrame =
    Mixing.neymanAllocation(Tables.documents(spark, dir), "source",
        "n_chars", budget = 1000L)
      .orderBy(col("source"))

  val neymanAllocSql: String =
    """WITH m AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS s,
      |    CAST(SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
      |      AS BIGINT) AS s2
      |  FROM documents GROUP BY 1),
      |sd AS (SELECT source, n_docs,
      |    sqrt(GREATEST(CAST(s2 AS DOUBLE) / n_docs -
      |      (CAST(s AS DOUBLE) / n_docs) * (CAST(s AS DOUBLE) / n_docs),
      |      0.0)) AS sdv
      |  FROM m),
      |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tn,
      |    CAST(SUM(CAST(n_docs * sdv AS DECIMAL(28,12))) AS DOUBLE) AS tns
      |  FROM sd)
      |SELECT source, n_docs, ROUND(sdv, 6) AS sd,
      |  ROUND(1000.0 * n_docs / tn, 6) AS prop_n,
      |  ROUND(1000.0 * (n_docs * sdv) / tns, 6) AS neyman_n
      |FROM sd CROSS JOIN t ORDER BY source""".stripMargin

  // --------------------------------------------------------------------------
  // Markov entropy rate of the event stream
  // --------------------------------------------------------------------------

  /** Entropy rate of the per-user event-type process:
    * H(X_t | X_{t−1}) = Σ_ij (c_ij/C)·log2(c_i·/c_ij) over the pooled
    * transition counts — how predictable the next action is given the
    * current one, against the log2(k) ceiling. The one-number summary of
    * q_transition_matrix (its per-cell detail) and q_markov2 (the order-2
    * refinement).
    */
  def qEntropyRate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val c = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("f"), col("next_type").as("t"))
      .agg(count(lit(1)).as("n"))
    val rows = c.groupBy(col("f")).agg(sum(col("n")).as("n_f"))
    val tot = c.agg(sum(col("n")).as("c_tot"),
      countDistinct(col("f")).as("n_states"))
    c.join(rows, "f").crossJoin(broadcast(tot))
      .select(col("c_tot"), col("n_states"),
        ((col("n").cast("double") / col("c_tot")) *
          log2(col("n_f").cast("double") / col("n")))
          .cast("decimal(18,8)").as("__term"))
      .groupBy(col("c_tot").as("n_transitions"), col("n_states"))
      .agg(sum(col("__term")).as("__h"))
      .select(col("n_transitions"), col("n_states"),
        round(col("__h").cast("double"), 6).as("entropy_rate_bits"),
        round(log2(col("n_states").cast("double")), 6).as("max_bits"),
        round(lit(1.0) - col("__h").cast("double") /
          log2(col("n_states").cast("double")), 6).as("predictability"))
  }

  val entropyRateSql: String =
    """WITH s AS (SELECT event_type AS f,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS t
      |  FROM events),
      |c AS (SELECT f, t, COUNT(*) AS n FROM s WHERE t IS NOT NULL
      |  GROUP BY 1, 2),
      |r AS (SELECT f, CAST(SUM(n) AS BIGINT) AS n_f FROM c GROUP BY 1),
      |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS c_tot,
      |    COUNT(DISTINCT f) AS n_states FROM c),
      |h AS (SELECT c_tot AS n_transitions, n_states,
      |    SUM(CAST((CAST(n AS DOUBLE) / c_tot) *
      |      log2(CAST(n_f AS DOUBLE) / n) AS DECIMAL(18,8))) AS hh
      |  FROM c JOIN r USING (f) CROSS JOIN tt GROUP BY 1, 2)
      |SELECT n_transitions, n_states,
      |  ROUND(CAST(hh AS DOUBLE), 6) AS entropy_rate_bits,
      |  ROUND(log2(CAST(n_states AS DOUBLE)), 6) AS max_bits,
      |  ROUND(1.0 - CAST(hh AS DOUBLE) / log2(CAST(n_states AS DOUBLE)), 6)
      |    AS predictability
      |FROM h""".stripMargin

  // --------------------------------------------------------------------------
  // DAU/MAU stickiness
  // --------------------------------------------------------------------------

  /** Daily stickiness: DAU over the trailing-30-day MAU — the engagement
    * ratio next to q_rolling_dau's raw counts. MAU's sliding DISTINCT can't
    * ride a window aggregate; the exact form joins the bounded day spine
    * against the (user, day) grain and de-dupes per (spine day, user) —
    * |days| × active-users rows, a calendar-bounded frame.
    */
  def qStickiness(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .localCheckpoint(eager = true) // spine + DAU + MAU branches read it
    val days = ud.select(col("day")).distinct().withColumnRenamed("day", "d")
    val dau = ud.groupBy(col("day").as("d")).agg(count(lit(1)).as("dau"))
    val mau = days.join(ud,
        col("day") <= col("d") && col("day") >= date_sub(col("d"), 29))
      .select(col("d"), col("user_id")).distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("mau"))
    dau.join(mau, "d")
      .select(col("d").as("day"), col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
      .orderBy(col("day"))
  }

  val stickinessSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |  FROM events),
      |d AS (SELECT DISTINCT day AS d FROM ud),
      |dau AS (SELECT day AS d, COUNT(*) AS dau FROM ud GROUP BY 1),
      |mau AS (SELECT d, COUNT(DISTINCT user_id) AS mau
      |  FROM d JOIN ud ON ud.day <= d.d AND ud.day >= d.d - INTERVAL 29 DAY
      |  GROUP BY 1)
      |SELECT dau.d AS day, dau, mau,
      |  ROUND(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
      |FROM dau JOIN mau ON dau.d = mau.d ORDER BY day""".stripMargin

  // --------------------------------------------------------------------------
  // Two-feature ridge regression
  // --------------------------------------------------------------------------

  /** Per-brand ridge fit of line price (cents) on quantity and discount
    * percent ([[graft.ext.Drift.ridge2]], λ = 1000 in centered-moment
    * units) — the multicollinearity-robust upgrade of q_brand_elasticity's
    * single-feature OLS, solved in closed 2×2 form from one exact-DECIMAL
    * moment pass.
    */
  def qRidgePrice(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_discount") * 100, 0).cast("long").as("disc"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
    graft.ext.Drift.ridge2(x, "brand", "qty", "disc", "cents",
        lambda = 1000.0)
      .orderBy(col("brand"))
  }

  val ridgePriceSql: String =
    """WITH x AS (SELECT p_brand AS brand,
      |    CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(28,4)) AS x1,
      |    CAST(CAST(ROUND(l_discount * 100) AS BIGINT) AS DECIMAL(28,4))
      |      AS x2,
      |    CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      |      AS DECIMAL(28,4)) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |m AS (SELECT brand, COUNT(*) AS n,
      |    SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
      |    SUM(x1 * x1) AS s11, SUM(x2 * x2) AS s22, SUM(x1 * x2) AS s12,
      |    SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y, SUM(y * y) AS syy
      |  FROM x GROUP BY 1),
      |c AS (SELECT brand, n,
      |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
      |    CAST(sy AS DOUBLE) AS syd,
      |    CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n
      |      + 1000.0 AS a11,
      |    CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n
      |      + 1000.0 AS a22,
      |    CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n
      |      AS c12,
      |    CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / n
      |      AS c1y,
      |    CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / n
      |      AS c2y,
      |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n
      |      AS cyy
      |  FROM m),
      |f AS (SELECT brand, n, s1d, s2d, syd, c1y, c2y, cyy,
      |    (a22 * c1y - c12 * c2y) /
      |      (CASE WHEN a11 * a22 - c12 * c12 = 0.0 THEN NULL
      |            ELSE a11 * a22 - c12 * c12 END) AS b1,
      |    (a11 * c2y - c12 * c1y) /
      |      (CASE WHEN a11 * a22 - c12 * c12 = 0.0 THEN NULL
      |            ELSE a11 * a22 - c12 * c12 END) AS b2
      |  FROM c)
      |SELECT brand, n, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2,
      |  ROUND((syd - b1 * s1d - b2 * s2d) / n, 6) AS intercept,
      |  ROUND((b1 * c1y + b2 * c2y) /
      |    (CASE WHEN cyy = 0.0 THEN NULL ELSE cyy END), 6) AS r2
      |FROM f ORDER BY brand""".stripMargin

  // --------------------------------------------------------------------------
  // Shuffle-quality audit of the corpus order
  // --------------------------------------------------------------------------

  /** χ² source-mix drift of 25-doc chunks under doc_id order
    * ([[Mixing.shuffleQuality]]) — "is this data order shuffled enough to
    * batch from?"; mean χ² near df = clean, a clumped order blows max_chi2
    * up.
    */
  def qShuffleQuality(spark: SparkSession, dir: String): DataFrame =
    Mixing.shuffleQuality(Tables.documents(spark, dir), "doc_id", "source",
      chunkSize = 25)

  val shuffleQualitySql: String =
    """WITH b AS (SELECT doc_id // 25 AS chunk, source AS src
      |  FROM documents),
      |c AS (SELECT chunk, src, COUNT(*) AS o FROM b GROUP BY 1, 2),
      |ct AS (SELECT chunk, CAST(SUM(o) AS BIGINT) AS n_c FROM c GROUP BY 1),
      |st AS (SELECT src, CAST(SUM(o) AS BIGINT) AS n_s FROM c GROUP BY 1),
      |g AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot,
      |    COUNT(*) AS n_sources FROM st),
      |grid AS (SELECT ct.chunk, st.src, ct.n_c, st.n_s,
      |    COALESCE(c.o, 0) AS o, g.n_tot, g.n_sources
      |  FROM ct CROSS JOIN st
      |  LEFT JOIN c ON c.chunk = ct.chunk AND c.src = st.src
      |  CROSS JOIN g),
      |chi AS (SELECT chunk, n_sources,
      |    CAST(SUM(CAST(
      |      (o - CAST(n_c AS DOUBLE) * n_s / n_tot) *
      |      (o - CAST(n_c AS DOUBLE) * n_s / n_tot) /
      |      (CAST(n_c AS DOUBLE) * n_s / n_tot) AS DECIMAL(18,8)))
      |      AS DOUBLE) AS chi2
      |  FROM grid GROUP BY 1, 2)
      |SELECT COUNT(*) AS n_chunks, n_sources, n_sources - 1 AS df,
      |  ROUND(CAST(SUM(CAST(chi2 AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*), 6)
      |    AS mean_chi2,
      |  ROUND(MAX(chi2), 6) AS max_chi2
      |FROM chi GROUP BY n_sources""".stripMargin

  // --------------------------------------------------------------------------
  // Lorenz curve deciles
  // --------------------------------------------------------------------------

  /** Lorenz curve of item interaction volume at decile resolution — the
    * curve q_gini integrates: items ranked ascending by volume
    * ([[graft.ext.GlobalRank.globalRowNumber]], no single-task sort), cut
    * into 10 equal-count tiers, cumulative volume share per tier.
    */
  def qLorenzCurve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("volume"))
    val ranked = graft.ext.GlobalRank.globalRowNumber(
      counts, Seq(col("volume"), col("l_partkey")))
    val n = ranked.agg(count(lit(1)).as("n_items"),
      sum(col("volume")).as("t_vol"))
    val dec = ranked.crossJoin(broadcast(n))
      .select(expr("(rn - 1) * 10 div n_items").as("decile"),
        col("volume"), col("t_vol"))
      .groupBy(col("decile"), col("t_vol"))
      .agg(count(lit(1)).as("n_items"), sum(col("volume")).as("vol"))
    // 10 rows post-aggregate — the unpartitioned cumsum window is bounded
    dec
      .withColumn("cum_vol", sum(col("vol")).over(Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("decile"), col("n_items"), col("vol"),
        round(col("cum_vol").cast("double") / col("t_vol"), 6)
          .as("cum_share"))
      .orderBy(col("decile"))
  }

  val lorenzCurveSql: String =
    """WITH c AS (SELECT l_partkey, COUNT(*) AS volume FROM lineitem
      |  GROUP BY 1),
      |r AS (SELECT volume,
      |    ROW_NUMBER() OVER (ORDER BY volume, l_partkey) AS rn FROM c),
      |nn AS (SELECT COUNT(*) AS n_items, CAST(SUM(volume) AS BIGINT) AS t_vol
      |  FROM r),
      |d AS (SELECT (rn - 1) * 10 // n_items AS decile, t_vol,
      |    COUNT(*) AS n_items, CAST(SUM(volume) AS BIGINT) AS vol
      |  FROM r CROSS JOIN nn GROUP BY 1, 2)
      |SELECT decile, n_items, vol,
      |  ROUND(CAST(CAST(SUM(vol) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS DOUBLE) / t_vol, 6) AS cum_share
      |FROM d ORDER BY decile""".stripMargin

  // --------------------------------------------------------------------------
  // Sort-layout prefix-compression estimate
  // --------------------------------------------------------------------------

  /** Delta/prefix-encoding savings a p_name sort layout buys
    * ([[graft.ext.Layout.prefixCompressionStats]], native
    * `common_prefix_len` kernel): adjacent-row common prefixes under the
    * sorted order vs the natural p_partkey order.
    */
  def qPrefixCompress(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Layout.prefixCompressionStats(Tables.part(spark, dir),
      "p_name", col("p_partkey"))

  val prefixCompressSql: String =
    """WITH base AS (SELECT p_name AS s, p_partkey AS k FROM part),
      |so AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s, k) AS rn FROM base),
      |sp AS (SELECT a.s AS s, b.s AS t FROM so a JOIN so b
      |  ON b.rn = a.rn + 1),
      |na AS (SELECT s, ROW_NUMBER() OVER (ORDER BY k) AS rn FROM base),
      |np AS (SELECT a.s AS s, b.s AS t FROM na a JOIN na b
      |  ON b.rn = a.rn + 1),
      |pfx_s AS (SELECT COUNT(*) AS n_pairs,
      |    CAST(SUM(length(s)) AS BIGINT) AS sum_len,
      |    CAST(SUM(len(list_filter(
      |      range(1, LEAST(length(s), length(t)) + 1),
      |      i -> substr(s, 1, CAST(i AS INTEGER)) =
      |           substr(t, 1, CAST(i AS INTEGER))))) AS BIGINT) AS sum_prefix
      |  FROM sp),
      |pfx_n AS (SELECT CAST(SUM(length(s)) AS BIGINT) AS nat_len,
      |    CAST(SUM(len(list_filter(
      |      range(1, LEAST(length(s), length(t)) + 1),
      |      i -> substr(s, 1, CAST(i AS INTEGER)) =
      |           substr(t, 1, CAST(i AS INTEGER))))) AS BIGINT) AS nat_prefix
      |  FROM np)
      |SELECT n_pairs,
      |  ROUND(CAST(sum_len AS DOUBLE) / n_pairs, 6) AS avg_len,
      |  ROUND(CAST(sum_prefix AS DOUBLE) / n_pairs, 6) AS avg_prefix_sorted,
      |  ROUND(CAST(nat_prefix AS DOUBLE) / n_pairs, 6)
      |    AS avg_prefix_natural,
      |  ROUND(CAST(sum_prefix AS DOUBLE) / sum_len, 6) AS savings_sorted,
      |  ROUND(CAST(nat_prefix AS DOUBLE) / nat_len, 6) AS savings_natural
      |FROM pfx_s CROSS JOIN pfx_n""".stripMargin

  // --------------------------------------------------------------------------
  // Difference-in-differences
  // --------------------------------------------------------------------------

  /** 2×2 DiD of line quantity: treated = large parts (p_size > 25), post =
    * orders from 1998 on ([[Experiment.diffInDiff]]) — the observational
    * causal estimate next to q_cuped's randomized variance reduction.
    */
  def qDiffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select((col("p_size") > 25).as("treated"),
        (col("o_orderdate") >= lit("1998-01-01").cast("date")).as("post"),
        col("l_quantity").cast("long").as("qty"))
    Experiment.diffInDiff(x, "treated", "post", "qty")
  }

  val diffInDiffSql: String =
    """WITH x AS (SELECT p_size > 25 AS treated,
      |    o_orderdate >= DATE '1998-01-01' AS post,
      |    CAST(l_quantity AS BIGINT) AS v
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey),
      |a AS (SELECT COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
      |  CAST(SUM(CASE WHEN treated AND NOT post THEN v ELSE 0 END) AS BIGINT) AS s_tp,
      |  CAST(SUM(CASE WHEN treated AND NOT post THEN v * v ELSE 0 END) AS BIGINT) AS q_tp,
      |  CAST(SUM(CASE WHEN treated AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_tq,
      |  CAST(SUM(CASE WHEN treated AND post THEN v ELSE 0 END) AS BIGINT) AS s_tq,
      |  CAST(SUM(CASE WHEN treated AND post THEN v * v ELSE 0 END) AS BIGINT) AS q_tq,
      |  CAST(SUM(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
      |  CAST(SUM(CASE WHEN NOT treated AND NOT post THEN v ELSE 0 END) AS BIGINT) AS s_cp,
      |  CAST(SUM(CASE WHEN NOT treated AND NOT post THEN v * v ELSE 0 END) AS BIGINT) AS q_cp,
      |  CAST(SUM(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_cq,
      |  CAST(SUM(CASE WHEN NOT treated AND post THEN v ELSE 0 END) AS BIGINT) AS s_cq,
      |  CAST(SUM(CASE WHEN NOT treated AND post THEN v * v ELSE 0 END) AS BIGINT) AS q_cq
      |  FROM x),
      |f AS (SELECT n,
      |    CAST(s_tp AS DOUBLE) / n_tp AS m_tp, CAST(s_tq AS DOUBLE) / n_tq AS m_tq,
      |    CAST(s_cp AS DOUBLE) / n_cp AS m_cp, CAST(s_cq AS DOUBLE) / n_cq AS m_cq,
      |    (CAST(q_tp AS DOUBLE) / n_tp - (CAST(s_tp AS DOUBLE) / n_tp) * (CAST(s_tp AS DOUBLE) / n_tp)) / n_tp +
      |    (CAST(q_tq AS DOUBLE) / n_tq - (CAST(s_tq AS DOUBLE) / n_tq) * (CAST(s_tq AS DOUBLE) / n_tq)) / n_tq +
      |    (CAST(q_cp AS DOUBLE) / n_cp - (CAST(s_cp AS DOUBLE) / n_cp) * (CAST(s_cp AS DOUBLE) / n_cp)) / n_cp +
      |    (CAST(q_cq AS DOUBLE) / n_cq - (CAST(s_cq AS DOUBLE) / n_cq) * (CAST(s_cq AS DOUBLE) / n_cq)) / n_cq
      |      AS var_sum
      |  FROM a)
      |SELECT n,
      |  ROUND(m_tp, 6) AS y_treated_pre, ROUND(m_tq, 6) AS y_treated_post,
      |  ROUND(m_cp, 6) AS y_control_pre, ROUND(m_cq, 6) AS y_control_post,
      |  ROUND((m_tq - m_tp) - (m_cq - m_cp), 6) AS did,
      |  ROUND(sqrt(var_sum), 6) AS se,
      |  ROUND(((m_tq - m_tp) - (m_cq - m_cp)) /
      |    (CASE WHEN sqrt(var_sum) = 0.0 THEN NULL ELSE sqrt(var_sum) END), 6)
      |    AS z_stat
      |FROM f""".stripMargin

  // --------------------------------------------------------------------------
  // Geometric adstock correlation
  // --------------------------------------------------------------------------

  /** Does carryover-transformed click volume explain purchases better than
    * raw clicks? ([[graft.ext.Attribution.adstockCorrelation]], θ = 0.7 via
    * the literal ln θ, 14-day truncation.)
    */
  def qAdstock(spark: SparkSession, dir: String): DataFrame = {
    val dly = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vm")).as("v"))
      .localCheckpoint(eager = true)
    graft.ext.Attribution.adstockCorrelation(
      dly.filter(col("event_type") === "click"),
      dly.filter(col("event_type") === "purchase"),
      "day", "v", "v", lnTheta = -0.35667494393873245, maxLag = 14)
  }

  val adstockSql: String =
    """WITH dly AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS HUGEINT) AS v
      |  FROM events GROUP BY 1, 2),
      |x AS (SELECT d, v AS xv FROM dly WHERE g = 'click'),
      |y AS (SELECT d, v AS yv FROM dly WHERE g = 'purchase'),
      |l AS (SELECT unnest(generate_series(0, 14)) AS k),
      |lg AS (SELECT x.d + CAST(l.k AS INTEGER) AS tday,
      |    CAST(exp(l.k * -3.5667494393873245E-1) * x.xv AS DECIMAL(28,12))
      |      AS term
      |  FROM x CROSS JOIN l),
      |ads AS (SELECT tday, SUM(term) AS a FROM lg GROUP BY 1),
      |j AS (SELECT CAST(y.yv AS DOUBLE) AS yd, CAST(ads.a AS DOUBLE) AS ad,
      |    CAST(x.xv AS DOUBLE) AS xd
      |  FROM y JOIN ads ON y.d = ads.tday JOIN x ON x.d = y.d),
      |m AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(xd AS DECIMAL(28,12))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(yd AS DECIMAL(28,12))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(ad AS DECIMAL(28,12))) AS DOUBLE) AS sa,
      |    CAST(SUM(CAST(xd * yd AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(ad * yd AS DECIMAL(38,12))) AS DOUBLE) AS say,
      |    CAST(SUM(CAST(xd * xd AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(ad * ad AS DECIMAL(38,12))) AS DOUBLE) AS saa,
      |    CAST(SUM(CAST(yd * yd AS DECIMAL(38,12))) AS DOUBLE) AS syy
      |  FROM j)
      |SELECT n AS n_days,
      |  ROUND((n * sxy - sx * sy) /
      |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_raw,
      |  ROUND((n * say - sa * sy) /
      |    sqrt((n * saa - sa * sa) * (n * syy - sy * sy)), 6)
      |    AS corr_adstock
      |FROM m""".stripMargin

  // --------------------------------------------------------------------------
  // Peak detection
  // --------------------------------------------------------------------------

  /** Local maxima of the daily value series per event_type
    * ([[graft.ext.Series.peaks]]) — which days spiked relative to their
    * immediate neighbors, with prominence in original units.
    */
  def qPeaks(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vm")).as("v"))
    graft.ext.Series.peaks(daily, "event_type", "day", "v", unitScale = 1e6)
      .orderBy(col("event_type"), col("day"))
  }

  val peaksSql: String =
    """WITH dly AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS HUGEINT) AS v
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT g, d, v,
      |    LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv,
      |    LEAD(v) OVER (PARTITION BY g ORDER BY d) AS nv
      |  FROM dly)
      |SELECT g AS event_type, d AS day,
      |  ROUND(CAST(v AS DOUBLE) / 1000000.0, 6) AS value,
      |  ROUND(CAST(v - GREATEST(pv, nv) AS DOUBLE) / 1000000.0, 6)
      |    AS prominence
      |FROM w
      |WHERE pv IS NOT NULL AND nv IS NOT NULL AND v > pv AND v > nv
      |ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------
  // QQ plot between two brand price distributions
  // --------------------------------------------------------------------------

  /** Decile QQ points of Brand#11 vs Brand#22 line prices — the
    * distribution-comparison surface behind q_ks_drift's one-number
    * statistic: where exactly do the two distributions diverge? Per-group
    * quantiles are rank-picked within group-partitioned windows (exact, no
    * interpolation; `percentile_disc` convention rn = ⌈p·n⌉).
    */
  def qQqPlot(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isin("Brand#11", "Brand#22"))
      .select(col("p_brand").as("brand"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"))
    val w = Window.partitionBy(col("brand")).orderBy(col("cents"), col("tie"))
    val ranked = x.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("brand"))))
    val probs = spark.range(1, 10)
      .select((col("id").cast("double") / 10).as("p"))
    val at = ranked.join(broadcast(probs),
        col("rn") === greatest(lit(1L), ceil(col("p") * col("n")).cast("long")))
      .select(col("p"), col("brand"), col("cents"))
    at.groupBy(col("p"))
      .agg(max(when(col("brand") === "Brand#11", col("cents"))).as("q_a"),
        max(when(col("brand") === "Brand#22", col("cents"))).as("q_b"))
      .select(col("p"), col("q_a"), col("q_b"),
        round(col("q_a").cast("double") / col("q_b"), 6).as("qq_ratio"))
      .orderBy(col("p"))
  }

  val qqPlotSql: String =
    """WITH x AS (SELECT p_brand AS brand,
      |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
      |    l_orderkey * 8 + l_linenumber AS tie
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand IN ('Brand#11', 'Brand#22')),
      |r AS (SELECT brand, cents,
      |    ROW_NUMBER() OVER (PARTITION BY brand ORDER BY cents, tie) AS rn,
      |    COUNT(*) OVER (PARTITION BY brand) AS n FROM x),
      |pr AS (SELECT CAST(i AS DOUBLE) / 10 AS p
      |  FROM (SELECT unnest(generate_series(1, 9)) AS i)),
      |at AS (SELECT p, brand, cents FROM r JOIN pr
      |  ON rn = GREATEST(1, CAST(ceil(p * n) AS BIGINT)))
      |SELECT p,
      |  MAX(CASE WHEN brand = 'Brand#11' THEN cents END) AS q_a,
      |  MAX(CASE WHEN brand = 'Brand#22' THEN cents END) AS q_b,
      |  ROUND(CAST(MAX(CASE WHEN brand = 'Brand#11' THEN cents END)
      |    AS DOUBLE) / MAX(CASE WHEN brand = 'Brand#22' THEN cents END), 6)
      |    AS qq_ratio
      |FROM at GROUP BY p ORDER BY p""".stripMargin

  // --------------------------------------------------------------------------
  // Chapman capture–recapture catalog estimate
  // --------------------------------------------------------------------------

  /** Chapman mark–recapture estimate of the active catalog from two
    * independent "sightings" (parts ordered in 1995-01 vs 1995-02):
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — the classic "how big is the population
    * we're sampling from" estimator, scored against the true part count.
    * The corpus-survey workhorse when full enumeration is off the table.
    */
  def qCaptureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey"), date_format(col("o_orderdate"), "yyyy-MM")
        .as("m"))
    val s1 = li.filter(col("m") === "1995-01").select(col("l_partkey")).distinct()
      .localCheckpoint(eager = true) // counted + overlap-joined
    val s2 = li.filter(col("m") === "1995-02").select(col("l_partkey")).distinct()
      .localCheckpoint(eager = true)
    val n1 = s1.agg(count(lit(1)).as("n1"))
    val n2 = s2.agg(count(lit(1)).as("n2"))
    val m = s1.join(s2, "l_partkey").agg(count(lit(1)).as("m"))
    val truth = Tables.part(spark, dir).agg(count(lit(1)).as("true_n"))
    n1.crossJoin(n2).crossJoin(m).crossJoin(truth)
      .select(col("n1"), col("n2"), col("m"), col("true_n"),
        round((col("n1") + 1).cast("double") * (col("n2") + 1) /
          (col("m") + 1) - 1, 6).as("chapman_n"),
        round(((col("n1") + 1).cast("double") * (col("n2") + 1) /
          (col("m") + 1) - 1) / col("true_n"), 6).as("coverage_ratio"))
  }

  val captureRecaptureSql: String =
    """WITH li AS (SELECT l_partkey, strftime(o_orderdate, '%Y-%m') AS m
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |s1 AS (SELECT DISTINCT l_partkey FROM li WHERE m = '1995-01'),
      |s2 AS (SELECT DISTINCT l_partkey FROM li WHERE m = '1995-02'),
      |a AS (SELECT (SELECT COUNT(*) FROM s1) AS n1,
      |    (SELECT COUNT(*) FROM s2) AS n2,
      |    (SELECT COUNT(*) FROM s1 JOIN s2 USING (l_partkey)) AS m,
      |    (SELECT COUNT(*) FROM part) AS true_n)
      |SELECT n1, n2, m, true_n,
      |  ROUND(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 6)
      |    AS chapman_n,
      |  ROUND((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1) / true_n, 6)
      |    AS coverage_ratio
      |FROM a""".stripMargin

  // --------------------------------------------------------------------------
  // Chao1 vocabulary richness + Good–Turing unseen mass
  // --------------------------------------------------------------------------

  /** How much of the PHRASE space has the corpus not shown yet? Chao1
    * richness in its bias-corrected form `V + n₁(n₁−1)/(2(n₂+1))` (defined
    * even with no doubletons) over word 3-shingle types, plus the
    * Good–Turing unseen-probability mass `n₁/N` — the saturation gauge next
    * to q_heaps_law's growth exponent. Unigrams are useless here (the
    * synthetic vocabulary is closed — zero singletons); 3-shingles have the
    * heavy rare tail richness estimation exists for.
    */
  def qChao1(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(graft.functions.WordShingles.shingles(col("text"), 3))
        .as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    counts.agg(count(lit(1)).as("vocab_seen"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_doubletons"))
      .select(col("vocab_seen"), col("n_tokens"), col("n_singletons"),
        col("n_doubletons"),
        round(col("vocab_seen") +
          (col("n_singletons") * (col("n_singletons") - 1)).cast("double") /
          ((col("n_doubletons") + 1) * 2), 6).as("chao1"),
        round(col("n_singletons").cast("double") / col("n_tokens"), 6)
          .as("unseen_mass"))
  }

  val chao1Sql: String =
    """WITH t AS (SELECT string_split(text, ' ') AS l FROM documents),
      |c AS (SELECT tok, COUNT(*) AS c FROM
      |    (SELECT unnest(list_transform(
      |      generate_series(1, greatest(len(l) - 2, 1)),
      |      i -> array_to_string(list_slice(l, i, least(i + 2, len(l))), ' ')))
      |      AS tok FROM t)
      |  GROUP BY 1)
      |SELECT COUNT(*) AS vocab_seen,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_singletons,
      |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_doubletons,
      |  ROUND(COUNT(*) +
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) *
      |         (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1) AS DOUBLE) /
      |    ((SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1) * 2), 6) AS chao1,
      |  ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(SUM(c) AS BIGINT), 6) AS unseen_mass
      |FROM c""".stripMargin

  // --------------------------------------------------------------------------
  // Count overdispersion
  // --------------------------------------------------------------------------

  /** Poisson-overdispersion audit of daily event counts per type: dispersion
    * index var/mean and the χ² index-of-dispersion test
    * z = (χ² − (n−1))/√(2(n−1)) — the "is a Poisson model even admissible"
    * gate before any count-based alerting threshold (overdispersed feeds
    * need negative-binomial thresholds or q_cusum's empirical
    * standardization). All moments exact integer daily counts.
    */
  def qOverdispersion(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val m = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("s2"))
    val mean = col("s").cast("double") / col("n_days")
    val vr = col("s2").cast("double") / col("n_days") - mean * mean
    val chi2 = col("n_days") * vr / mean
    val z = (chi2 - (col("n_days") - 1)) /
      sqrt((col("n_days") - 1).cast("double") * 2)
    m.select(col("event_type"), col("n_days"),
        round(mean, 6).as("mean"), round(vr, 6).as("variance"),
        round(vr / mean, 6).as("dispersion"),
        round(chi2, 6).as("chi2"), round(z, 6).as("z_stat"),
        (z > 1.96).as("overdispersed"))
      .orderBy(col("event_type"))
  }

  val overdispersionSql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    COUNT(*) AS c FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, COUNT(*) AS n_days,
      |    CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS s2
      |  FROM d GROUP BY 1),
      |f AS (SELECT event_type, n_days,
      |    CAST(s AS DOUBLE) / n_days AS mean,
      |    CAST(s2 AS DOUBLE) / n_days -
      |      (CAST(s AS DOUBLE) / n_days) * (CAST(s AS DOUBLE) / n_days)
      |      AS vr
      |  FROM m),
      |g AS (SELECT event_type, n_days, mean, vr,
      |    n_days * vr / mean AS chi2,
      |    (n_days * vr / mean - (n_days - 1)) /
      |      sqrt(CAST(n_days - 1 AS DOUBLE) * 2) AS z
      |  FROM f)
      |SELECT event_type, n_days, ROUND(mean, 6) AS mean,
      |  ROUND(vr, 6) AS variance, ROUND(vr / mean, 6) AS dispersion,
      |  ROUND(chi2, 6) AS chi2, ROUND(z, 6) AS z_stat,
      |  z > 1.96 AS overdispersed
      |FROM g ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Jackknife standard error of a ratio metric
  // --------------------------------------------------------------------------

  /** Delete-one-brand jackknife SE of the corpus return rate: θ_(i) =
    * (R−r_i)/(N−n_i) from per-brand exact counts (the [[graft.ext
    * .Importance.looSourceImpact]] LOO algebra), SE = √((k−1)/k ·
    * Σ(θ_(i) − θ̄)²) — the honest uncertainty of a ratio whose rows are
    * CLUSTERED by brand, where the naive binomial SE undercounts.
    */
  def qJackknifeSe(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_b"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r_b"))
      .localCheckpoint(eager = true) // totals + per-brand LOO read it
    val tot = b.agg(sum(col("n_b")).as("nn"), sum(col("r_b")).as("rr"),
      count(lit(1)).as("k"))
    val loo = b.crossJoin(broadcast(tot))
      .select(col("nn"), col("rr"), col("k"),
        ((col("rr") - col("r_b")).cast("double") /
          (col("nn") - col("n_b"))).as("th"))
    val mean = loo.groupBy(col("nn"), col("rr"), col("k"))
      .agg((sum(col("th").cast("decimal(28,12)")).cast("double") / col("k"))
        .as("th_bar"))
    loo.join(broadcast(mean), Seq("nn", "rr", "k"))
      .select(col("nn"), col("rr"), col("k"),
        ((col("th") - col("th_bar")) * (col("th") - col("th_bar")))
          .cast("decimal(28,12)").as("__d2"))
      .groupBy(col("k"), col("nn"), col("rr"))
      .agg(sum(col("__d2")).cast("double").as("__ss"))
      .select(col("k").as("n_strata"),
        round(col("rr").cast("double") / col("nn"), 6).as("theta"),
        round(sqrt((col("k") - 1).cast("double") / col("k") * col("__ss")), 6)
          .as("jackknife_se"))
  }

  val jackknifeSeSql: String =
    """WITH b AS (SELECT p_brand,
      |    COUNT(*) AS n_b,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r_b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_b) AS BIGINT) AS nn,
      |    CAST(SUM(r_b) AS BIGINT) AS rr, COUNT(*) AS k FROM b),
      |loo AS (SELECT nn, rr, k,
      |    CAST(rr - r_b AS DOUBLE) / (nn - n_b) AS th
      |  FROM b CROSS JOIN t),
      |mb AS (SELECT nn, rr, k,
      |    CAST(SUM(CAST(th AS DECIMAL(28,12))) AS DOUBLE) / k AS th_bar
      |  FROM loo GROUP BY 1, 2, 3),
      |ss AS (SELECT loo.k, loo.nn, loo.rr,
      |    CAST(SUM(CAST((th - th_bar) * (th - th_bar) AS DECIMAL(28,12)))
      |      AS DOUBLE) AS s2
      |  FROM loo JOIN mb ON loo.nn = mb.nn AND loo.rr = mb.rr
      |    AND loo.k = mb.k
      |  GROUP BY 1, 2, 3)
      |SELECT k AS n_strata,
      |  ROUND(CAST(rr AS DOUBLE) / nn, 6) AS theta,
      |  ROUND(sqrt(CAST(k - 1 AS DOUBLE) / k * s2), 6) AS jackknife_se
      |FROM ss""".stripMargin

  // --------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_err_rank" -> (qErrRank _),
    "q_hill_tail" -> (qHillTail _),
    "q_mann_kendall" -> (qMannKendall _),
    "q_unimax_alloc" -> (qUnimaxAlloc _),
    "q_data_constrained" -> (qDataConstrained _),
    "q_kripp_alpha" -> (qKrippAlpha _),
    "q_winsorized" -> (qWinsorized _),
    "q_kendall_tau" -> (qKendallTau _),
    "q_ljung_box" -> (qLjungBox _),
    "q_runs_test" -> (qRunsTest _),
    "q_bm25" -> (qBm25 _),
    "q_holt_linear" -> (qHoltLinear _),
    "q_best_split" -> (qBestSplit _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_more_like_this" -> (qMoreLikeThis _),
    "q_hhi" -> (qHhi _),
    "q_isotonic" -> (qIsotonic _),
    "q_simpson_paradox" -> (qSimpsonParadox _),
    "q_xcorr" -> (qXcorr _),
    "q_neyman_alloc" -> (qNeymanAlloc _),
    "q_entropy_rate" -> (qEntropyRate _),
    "q_stickiness" -> (qStickiness _),
    "q_ridge_price" -> (qRidgePrice _),
    "q_shuffle_quality" -> (qShuffleQuality _),
    "q_lorenz_curve" -> (qLorenzCurve _),
    "q_prefix_compress" -> (qPrefixCompress _),
    "q_diff_in_diff" -> (qDiffInDiff _),
    "q_adstock" -> (qAdstock _),
    "q_peaks" -> (qPeaks _),
    "q_qq_plot" -> (qQqPlot _),
    "q_capture_recapture" -> (qCaptureRecapture _),
    "q_chao1" -> (qChao1 _),
    "q_overdispersion" -> (qOverdispersion _),
    "q_jackknife_se" -> (qJackknifeSe _))

  val oracleSql: Map[String, String] = Map(
    "q_err_rank" -> errRankSql,
    "q_hill_tail" -> hillTailSql,
    "q_mann_kendall" -> mannKendallSql,
    "q_unimax_alloc" -> unimaxAllocSql,
    "q_data_constrained" -> dataConstrainedSql,
    "q_kripp_alpha" -> krippAlphaSql,
    "q_winsorized" -> winsorizedSql,
    "q_kendall_tau" -> kendallTauSql,
    "q_ljung_box" -> ljungBoxSql,
    "q_runs_test" -> runsTestSql,
    "q_bm25" -> bm25Sql,
    "q_holt_linear" -> holtLinearSql,
    "q_best_split" -> bestSplitSql,
    "q_weighted_median" -> weightedMedianSql,
    "q_more_like_this" -> moreLikeThisSql,
    "q_hhi" -> hhiSql,
    "q_isotonic" -> isotonicSql,
    "q_simpson_paradox" -> simpsonParadoxSql,
    "q_xcorr" -> xcorrSql,
    "q_neyman_alloc" -> neymanAllocSql,
    "q_entropy_rate" -> entropyRateSql,
    "q_stickiness" -> stickinessSql,
    "q_ridge_price" -> ridgePriceSql,
    "q_shuffle_quality" -> shuffleQualitySql,
    "q_lorenz_curve" -> lorenzCurveSql,
    "q_prefix_compress" -> prefixCompressSql,
    "q_diff_in_diff" -> diffInDiffSql,
    "q_adstock" -> adstockSql,
    "q_peaks" -> peaksSql,
    "q_qq_plot" -> qqPlotSql,
    "q_capture_recapture" -> captureRecaptureSql,
    "q_chao1" -> chao1Sql,
    "q_overdispersion" -> overdispersionSql,
    "q_jackknife_se" -> jackknifeSeSql)
}
