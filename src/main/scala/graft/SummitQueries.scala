package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Boilerplate, ChangeDetect, Communities, Experiment, Skyline}

/** Round-8 batch #3: pre-training boilerplate strip analytics, post-training
  * memorization audit, and the two experiment-design gates (power/MDE,
  * split-conformal coverage). Every oracle mirrors the Spark expression
  * shapes exactly — integer/DECIMAL moments with one final double division —
  * so results hash-match at sf0.01 and sf0.1.
  */
object SummitQueries {

  // --------------------------------------------------------------------------
  // Chunk-level boilerplate detection
  // --------------------------------------------------------------------------

  /** Per-document boilerplate share from within-source chunk doc-frequency
    * ([[Boilerplate.chunkBoilerplate]], CCNet line-dedup shape at 2-token
    * chunk granularity, 20% doc-frequency threshold).
    */
  def qBoilerplate(spark: SparkSession, dir: String): DataFrame =
    Boilerplate.chunkBoilerplate(Tables.documents(spark, dir), "source",
        "doc_id", "text", chunkTokens = 2, minDocFrac = 0.2)
      .withColumnRenamed("grp", "source")
      .orderBy(col("doc_id"))

  val boilerplateSql: String =
    """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t
      |  FROM documents),
      |ck AS (SELECT doc_id, source,
      |    unnest(generate_series(0, CAST(ceil(len(t) / 2.0) AS INT) - 1)) AS i,
      |    t
      |  FROM d),
      |c2 AS (SELECT doc_id, source,
      |    array_to_string(list_slice(t, i * 2 + 1, i * 2 + 2), ' ') AS chunk,
      |    len(list_slice(t, i * 2 + 1, i * 2 + 2)) AS clen
      |  FROM ck),
      |gd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |df AS (SELECT source, chunk, COUNT(DISTINCT doc_id) AS df_docs
      |  FROM c2 GROUP BY 1, 2),
      |bl AS (SELECT df.source, df.chunk,
      |    df.df_docs * 1000 >= 200 * gd.n_docs AS is_boiler
      |  FROM df JOIN gd USING (source))
      |SELECT c2.doc_id, c2.source, COUNT(*) AS n_chunks,
      |  CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_boiler_chunks,
      |  CAST(SUM(clen) AS BIGINT) AS n_tokens,
      |  ROUND(CAST(SUM(CASE WHEN is_boiler THEN clen ELSE 0 END) AS BIGINT)
      |    * 1.0 / CAST(SUM(clen) AS BIGINT), 6) AS boiler_token_frac
      |FROM c2 JOIN bl ON c2.source = bl.source AND c2.chunk = bl.chunk
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // Memorization-depth audit
  // --------------------------------------------------------------------------

  /** Deepest shared word n-gram order (3/5/8) between each held-out document
    * (doc_id % 10 < 2) and the training split
    * ([[Boilerplate.memorizationDepth]]).
    */
  def qMemorization(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Boilerplate.memorizationDepth(
        docs.filter(col("doc_id") % 10 >= 2),
        docs.filter(col("doc_id") % 10 < 2),
        "doc_id", "text", ns = Seq(3, 5, 8))
      .orderBy(col("doc_id"))
  }

  /** Per-order shingle CTE matching [[graft.functions.WordShingles]]: docs
    * shorter than n yield one partial shingle.
    */
  private def shingleCte(name: String, n: Int): String =
    s"""$name AS (SELECT DISTINCT doc_id, sh FROM (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(l) - ${n - 1}, 1)),
       |    i -> array_to_string(list_slice(l, i, least(i + ${n - 1}, len(l))),
       |      ' '))) AS sh
       |  FROM tk))""".stripMargin

  val memorizationSql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |${shingleCte("s3", 3)},
      |${shingleCte("s5", 5)},
      |${shingleCte("s8", 8)},
      |tr3 AS (SELECT DISTINCT sh FROM s3 WHERE doc_id % 10 >= 2),
      |tr5 AS (SELECT DISTINCT sh FROM s5 WHERE doc_id % 10 >= 2),
      |tr8 AS (SELECT DISTINCT sh FROM s8 WHERE doc_id % 10 >= 2),
      |h3 AS (SELECT DISTINCT s3.doc_id FROM s3 JOIN tr3 USING (sh)
      |  WHERE s3.doc_id % 10 < 2),
      |h5 AS (SELECT DISTINCT s5.doc_id FROM s5 JOIN tr5 USING (sh)
      |  WHERE s5.doc_id % 10 < 2),
      |h8 AS (SELECT DISTINCT s8.doc_id FROM s8 JOIN tr8 USING (sh)
      |  WHERE s8.doc_id % 10 < 2),
      |hd AS (SELECT doc_id FROM documents WHERE doc_id % 10 < 2)
      |SELECT hd.doc_id,
      |  h3.doc_id IS NOT NULL AS shared_3,
      |  h5.doc_id IS NOT NULL AS shared_5,
      |  h8.doc_id IS NOT NULL AS shared_8,
      |  CASE WHEN h8.doc_id IS NOT NULL THEN 8
      |       WHEN h5.doc_id IS NOT NULL THEN 5
      |       WHEN h3.doc_id IS NOT NULL THEN 3 ELSE 0 END AS max_shared_n
      |FROM hd
      |LEFT JOIN h3 ON hd.doc_id = h3.doc_id
      |LEFT JOIN h5 ON hd.doc_id = h5.doc_id
      |LEFT JOIN h8 ON hd.doc_id = h8.doc_id
      |ORDER BY hd.doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // A/B power / minimum detectable effect
  // --------------------------------------------------------------------------

  /** Per-event-type MDE of the user_id-parity bucketing over event `value`
    * ([[Experiment.powerMde]], α = 0.05 two-sided, power = 0.80).
    */
  def qPowerMde(spark: SparkSession, dir: String): DataFrame =
    Experiment.powerMde(
        Tables.events(spark, dir).select(col("event_type"),
          when(col("user_id") % 2 === 0, "A").otherwise("B").as("arm"),
          col("value")),
        "event_type", "arm", "value")
      .orderBy(col("segment"))

  val powerMdeSql: String = {
    val zSum = Experiment.ZAlphaTwoSided05 + Experiment.ZPower80
    s"""WITH e AS (SELECT event_type AS segment,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    CAST(ROUND(value * 1000000.0) AS BIGINT) AS vm
      |  FROM events),
      |g AS (SELECT segment, arm, COUNT(*) AS n, SUM(vm) AS s1,
      |    SUM(CAST(vm AS HUGEINT) * vm) AS s2
      |  FROM e GROUP BY 1, 2),
      |a AS (SELECT segment, n AS n_a, s1 AS s1_a, s2 AS s2_a FROM g
      |  WHERE arm = 'A'),
      |b AS (SELECT segment, n AS n_b, s1 AS s1_b, s2 AS s2_b FROM g
      |  WHERE arm = 'B'),
      |j AS (SELECT segment, n_a, n_b,
      |    CAST(s1_a AS DOUBLE) / n_a / 1000000.0 AS mean_a,
      |    CAST(s1_b AS DOUBLE) / n_b / 1000000.0 AS mean_b,
      |    $zSum * sqrt(
      |      (CAST(s2_a AS DOUBLE) -
      |        CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE) / n_a) /
      |        (n_a - 1) / 1000000000000.0 / n_a +
      |      (CAST(s2_b AS DOUBLE) -
      |        CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE) / n_b) /
      |        (n_b - 1) / 1000000000000.0 / n_b) AS mde
      |  FROM a JOIN b USING (segment)
      |  WHERE n_a > 1 AND n_b > 1)
      |SELECT segment, n_a, n_b, ROUND(mean_a, 6) AS mean_a,
      |  ROUND(mean_b, 6) AS mean_b, ROUND(mde, 6) AS mde_abs,
      |  ROUND(mde / NULLIF(mean_a, 0.0), 6) AS mde_rel
      |FROM j ORDER BY segment""".stripMargin
  }

  // --------------------------------------------------------------------------
  // Split-conformal coverage gate
  // --------------------------------------------------------------------------

  /** Conformal interval for l_extendedprice ~ l_quantity: calibrate on
    * l_orderkey % 5 = 0, α = 0.1 ([[Experiment.conformalGate]]); coverage on
    * the rest should come out ≥ ~0.9.
    */
  def qConformal(spark: SparkSession, dir: String): DataFrame =
    Experiment.conformalGate(Tables.lineitem(spark, dir),
      "l_quantity", "l_extendedprice", col("l_orderkey") % 5 === 0,
      alpha = 0.1, xScale = 1.0, yScale = 100.0)

  val conformalSql: String =
    """WITH base AS (SELECT CAST(ROUND(l_quantity * 1.0) AS HUGEINT) AS xi,
      |    CAST(ROUND(l_extendedprice * 100.0) AS HUGEINT) AS yi,
      |    l_orderkey % 5 = 0 AS is_cal
      |  FROM lineitem),
      |cal AS (SELECT * FROM base WHERE is_cal),
      |m0 AS (SELECT COUNT(*) AS n_cal, SUM(xi) AS sx, SUM(yi) AS sy,
      |    SUM(xi * xi) AS sxx, SUM(xi * yi) AS sxy FROM cal),
      |m1 AS (SELECT n_cal,
      |    CAST(n_cal * sxy - sx * sy AS DOUBLE) /
      |      CAST(n_cal * sxx - sx * sx AS DOUBLE) AS b_i,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd FROM m0),
      |m AS (SELECT n_cal, b_i,
      |    syd / n_cal - b_i * (sxd / n_cal) AS a_i FROM m1),
      |k AS (SELECT CAST(FLOOR(((n_cal + 1) * 900 + 999) / 1000.0) AS BIGINT)
      |    AS k, n_cal, a_i, b_i FROM m),
      |r AS (SELECT n_cal, a_i, b_i, k, xi, yi,
      |    ABS(CAST(yi AS DOUBLE) - (a_i + b_i * CAST(xi AS DOUBLE))) AS r
      |  FROM cal CROSS JOIN k),
      |rq AS (SELECT n_cal, a_i, b_i, r AS q_i FROM (
      |    SELECT *, ROW_NUMBER() OVER (ORDER BY r, xi, yi) AS rn FROM r)
      |  WHERE rn = LEAST(k, n_cal)),
      |t AS (SELECT COUNT(*) AS n_test,
      |    CAST(SUM(CASE WHEN ABS(CAST(yi AS DOUBLE) -
      |        (a_i + b_i * CAST(xi AS DOUBLE))) <= q_i
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cov,
      |    MAX(n_cal) AS n_cal, MAX(a_i) AS a_i, MAX(b_i) AS b_i,
      |    MAX(q_i) AS q_i
      |  FROM base CROSS JOIN rq WHERE NOT is_cal)
      |SELECT n_cal, n_test, ROUND(b_i * 0.01, 6) AS slope,
      |  ROUND(a_i / 100.0, 6) AS intercept, ROUND(q_i / 100.0, 6) AS q_alpha,
      |  ROUND(CAST(n_cov AS DOUBLE) / n_test, 6) AS coverage
      |FROM t""".stripMargin

  // --------------------------------------------------------------------------
  // Label-propagation communities
  // --------------------------------------------------------------------------

  /** Three rounds of deterministic synchronous label propagation
    * ([[Communities.labelPropagation]]) over the weighted repeat-co-purchase
    * graph (weight = number of orders containing both parts, edges with ≥2
    * co-orders). The oracle unrolls the same three rounds — one
    * aggregate + rank-1 CTE pair per round — so every adoption decision is
    * checked, not just the fixed point.
    */
  /** Weighted repeat-co-purchase edge list (weight = orders containing both
    * parts, edges with ≥2 co-orders) — basket form as in
    * InsightQueries.repeatEdges: one order-keyed set aggregate, pairs
    * generated map-side per basket. Shared with [[ApexQueries]]'
    * modularity query.
    */
  private[graft] def copurchaseEdges(spark: SparkSession,
                                     dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    l.groupBy(col("ok")).agg(collect_set(col("pk")).as("parts"))
      .select(explode(col("parts")).as("src"), col("parts"))
      .select(col("src"), explode(col("parts")).as("dst"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
  }

  def qCommunities(spark: SparkSession, dir: String): DataFrame =
    Communities.labelPropagation(copurchaseEdges(spark, dir),
        "src", "dst", "w", iters = 3)
      .orderBy(col("node"))

  /** One unrolled LPA round: labels `lPrev` → labels `lNext`. */
  private def lpaRoundSql(t: Int): String = {
    val (prev, a, r, next) = (s"l${t - 1}", s"a$t", s"r$t", s"l$t")
    s"""$a AS (SELECT s.dst, l.label AS lbl, CAST(SUM(s.w) AS BIGINT) AS wsum
       |  FROM sym s JOIN $prev l ON s.src = l.node GROUP BY 1, 2),
       |$r AS (SELECT dst, lbl, ROW_NUMBER() OVER (
       |    PARTITION BY dst ORDER BY wsum DESC, lbl) AS rn FROM $a),
       |$next AS (SELECT p.node, COALESCE(r.lbl, p.label) AS label
       |  FROM $prev p LEFT JOIN $r r ON p.node = r.dst AND r.rn = 1)"""
      .stripMargin
  }

  /** Shared CTE block (edges `e`, symmetric `sym`, LPA labels `l3`) — reused
    * by the modularity oracle in [[ApexQueries]].
    */
  private[graft] val communitiesCtes: String =
    s"""e AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
      |    COUNT(DISTINCT x.l_orderkey) AS w
      |  FROM lineitem x JOIN lineitem y
      |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT x.l_orderkey) >= 2),
      |sym AS (SELECT a AS src, b AS dst, w FROM e
      |  UNION ALL SELECT b, a, w FROM e),
      |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
      |${lpaRoundSql(1)},
      |${lpaRoundSql(2)},
      |${lpaRoundSql(3)}""".stripMargin

  val communitiesSql: String =
    s"""WITH $communitiesCtes
      |SELECT node, label FROM l3 ORDER BY node""".stripMargin

  // --------------------------------------------------------------------------
  // Characteristic terms per language (Monroe log-odds)
  // --------------------------------------------------------------------------

  /** Top-5 tokens distinguishing each language slice from the rest of the
    * corpus ([[graft.ext.TextStats.logOddsTerms]], prior mass 1000, min
    * global count 5).
    */
  def qLogOdds(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextStats.logOddsTerms(Tables.documents(spark, dir), "lang",
        "text", priorScale = 1000.0, minGlobalCount = 5, topK = 5)
      .withColumnRenamed("grp", "lang")
      .orderBy(col("lang"), col("term_rank"))

  val logOddsSql: String =
    """WITH tok AS (SELECT lang AS grp, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |gt AS (SELECT grp, t, COUNT(*) AS y_iw FROM tok GROUP BY 1, 2),
      |g AS (SELECT grp, CAST(SUM(y_iw) AS BIGINT) AS n_i FROM gt GROUP BY 1),
      |ct AS (SELECT t, CAST(SUM(y_iw) AS BIGINT) AS y_w FROM gt GROUP BY 1
      |  HAVING CAST(SUM(y_iw) AS BIGINT) >= 5),
      |tot AS (SELECT CAST(SUM(y_w) AS BIGINT) AS n_tot FROM ct),
      |j AS (SELECT gt.grp, gt.t, gt.y_iw, ct.y_w, g.n_i, tot.n_tot,
      |    1000.0 * CAST(ct.y_w AS DOUBLE) / tot.n_tot AS a_w,
      |    CAST(ct.y_w - gt.y_iw AS DOUBLE) AS y_rw,
      |    CAST(tot.n_tot - g.n_i AS DOUBLE) AS n_r
      |  FROM gt JOIN ct ON gt.t = ct.t JOIN g ON gt.grp = g.grp
      |  CROSS JOIN tot),
      |z AS (SELECT grp, t, y_iw, y_w,
      |    ROUND((ln((y_iw + a_w) / (n_i + 1000.0 - y_iw - a_w)) -
      |           ln((y_rw + a_w) / (n_r + 1000.0 - y_rw - a_w))) /
      |          sqrt(1.0 / (y_iw + a_w) + 1.0 / (y_rw + a_w)), 6) AS z_score
      |  FROM j),
      |r AS (SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY grp ORDER BY z_score DESC, t) AS term_rank FROM z)
      |SELECT grp AS lang, t AS token, y_iw AS n_grp, y_w AS n_global,
      |  z_score, term_rank
      |FROM r WHERE term_rank <= 5 ORDER BY lang, term_rank""".stripMargin

  // --------------------------------------------------------------------------
  // Empirical-Bayes shrunk return rates per brand
  // --------------------------------------------------------------------------

  /** Per-brand return-rate ranking before/after fixed-strength EB shrinkage
    * toward the pooled rate ([[graft.ext.Profiling.shrunkRates]], τ = 200).
    */
  def qEbShrinkage(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profiling.shrunkRates(
        Tables.lineitem(spark, dir)
          .join(Tables.part(spark, dir),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            (col("l_returnflag") === "R").as("is_return")),
        "brand", "is_return", tau = 200.0)
      .withColumnRenamed("grp", "brand")
      .orderBy(col("brand"))

  val ebShrinkageSql: String =
    """WITH g AS (SELECT p_brand AS brand, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS k
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      |p AS (SELECT CAST(SUM(k) AS BIGINT) AS tk, CAST(SUM(n) AS BIGINT) AS tn
      |  FROM g),
      |s AS (SELECT brand, n, k,
      |    CAST(k AS DOUBLE) / n AS raw,
      |    (k + CAST(tk AS DOUBLE) / tn * 200.0) / (n + 200.0) AS shrunk
      |  FROM g CROSS JOIN p),
      |r AS (SELECT *,
      |    ROW_NUMBER() OVER (ORDER BY raw DESC, brand) AS rank_raw,
      |    ROW_NUMBER() OVER (ORDER BY shrunk DESC, brand) AS rank_shrunk
      |  FROM s)
      |SELECT brand, n, k, ROUND(raw, 6) AS raw_rate,
      |  ROUND(shrunk, 6) AS shrunk_rate, rank_raw, rank_shrunk,
      |  CAST(rank_raw - rank_shrunk AS BIGINT) AS rank_shift
      |FROM r ORDER BY brand""".stripMargin

  // --------------------------------------------------------------------------
  // Pareto skyline
  // --------------------------------------------------------------------------

  /** Parts on the (retail price ↓, size ↑) Pareto frontier
    * ([[Skyline.skyline2d]] — histogram-pruned, no quadratic self-join). The
    * oracle re-derives the frontier from the distinct-price scaffold alone.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame =
    Skyline.skyline2d(
        Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
        "p_retailprice", "p_size")
      .orderBy(col("p_partkey"))

  val skylineSql: String =
    """WITH px AS (SELECT p_retailprice AS x, MAX(p_size) AS maxy
      |  FROM part GROUP BY 1),
      |sc AS (SELECT x, maxy, MAX(maxy) OVER (ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strict
      |  FROM px)
      |SELECT p.p_partkey, p.p_retailprice, p.p_size
      |FROM part p JOIN sc ON p.p_retailprice = sc.x
      |WHERE (sc.strict IS NULL OR sc.strict < p.p_size)
      |  AND sc.maxy <= p.p_size
      |ORDER BY p.p_partkey""".stripMargin

  // --------------------------------------------------------------------------
  // CUSUM change detection
  // --------------------------------------------------------------------------

  /** One-sided CUSUM (k = 0.5, h = 3) over each event type's daily
    * micro-quantized value volume ([[ChangeDetect.cusum]]); the oracle
    * replays the nonlinear fold day by day with a recursive CTE.
    */
  def qCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("vm")).as("v"))
    ChangeDetect.cusum(daily, "event_type", "day", "v", k = 0.5, h = 3.0)
      .select(col("event_type"), col("n_days"),
        round(col("max_s"), 6).as("max_s"), col("peak_day"), col("n_alarms"))
      .orderBy(col("event_type"))
  }

  val cusumSql: String =
    """WITH RECURSIVE dly AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS HUGEINT) AS v
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT g, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS s2
      |  FROM dly GROUP BY 1),
      |mm AS (SELECT g, CAST(s AS DOUBLE) / n AS mean,
      |    sqrt(GREATEST(CAST(s2 AS DOUBLE) / n -
      |      (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0)) AS sd
      |  FROM m),
      |z AS (SELECT dly.g, dly.d,
      |    ROW_NUMBER() OVER (PARTITION BY dly.g ORDER BY dly.d) AS rn,
      |    (CAST(dly.v AS DOUBLE) - mm.mean) /
      |      (CASE WHEN mm.sd > 0.0 THEN mm.sd ELSE 1.0 END) AS z
      |  FROM dly JOIN mm USING (g)),
      |f(g, rn, s, maxs, peak, alarms) AS (
      |  SELECT g, rn, GREATEST(z - 0.5, 0.0),
      |    GREATEST(z - 0.5, 0.0),
      |    CASE WHEN GREATEST(z - 0.5, 0.0) > 0.0 THEN d ELSE NULL END,
      |    CASE WHEN GREATEST(z - 0.5, 0.0) > 3.0 THEN 1 ELSE 0 END
      |  FROM z WHERE rn = 1
      |  UNION ALL
      |  SELECT z.g, z.rn, GREATEST(f.s + z.z - 0.5, 0.0),
      |    CASE WHEN GREATEST(f.s + z.z - 0.5, 0.0) > f.maxs
      |         THEN GREATEST(f.s + z.z - 0.5, 0.0) ELSE f.maxs END,
      |    CASE WHEN GREATEST(f.s + z.z - 0.5, 0.0) > f.maxs
      |         THEN z.d ELSE f.peak END,
      |    f.alarms + CASE WHEN GREATEST(f.s + z.z - 0.5, 0.0) > 3.0
      |               THEN 1 ELSE 0 END
      |  FROM f JOIN z ON z.g = f.g AND z.rn = f.rn + 1),
      |fin AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g ORDER BY rn DESC)
      |    AS rr FROM f)
      |SELECT g AS event_type, rn AS n_days, ROUND(maxs, 6) AS max_s,
      |  peak AS peak_day, CAST(alarms AS BIGINT) AS n_alarms
      |FROM fin WHERE rr = 1 ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // Incremental rollup maintenance
  // --------------------------------------------------------------------------

  /** Base rollup over 3/4 of the event stream merged with the remaining 1/4
    * as a late-arriving delta ([[graft.ext.Compaction.incrementalRollup]]);
    * the oracle recomputes the rollup from scratch over ALL events, so the
    * merge algebra itself is what's checked.
    */
  def qIncrementalRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 1e6, 0).cast("decimal(38,0)").as("vm"),
        col("event_id"))
    val base = ev.filter(col("event_id") % 4 < 3)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("s"))
    val delta = ev.filter(col("event_id") % 4 === 3)
    graft.ext.Compaction
      .incrementalRollup(base, delta, Seq("event_type", "day"), "vm")
      .select(col("event_type"), col("day"), col("n"),
        col("s").cast("long").as("s_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  val incrementalRollupSql: String =
    """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(ROUND(value * 1000000.0) AS BIGINT) AS vm FROM events)
      |SELECT event_type, day, COUNT(*) AS n, CAST(SUM(vm) AS BIGINT) AS s_micro
      |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------
  // Quantile normalization across sources
  // --------------------------------------------------------------------------

  /** Document lengths mapped onto the pooled length distribution per source
    * ([[graft.ext.Mixing.quantileNormalize]] — exact integer index
    * arithmetic, distributed pooled ranking).
    */
  def qQuantileNorm(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Mixing.quantileNormalize(Tables.documents(spark, dir),
        "source", "n_chars", "doc_id")
      .withColumnRenamed("grp", "source")
      .orderBy(col("doc_id"))

  val quantileNormSql: String =
    """WITH g AS (SELECT doc_id, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
      |      AS rg,
      |    COUNT(*) OVER (PARTITION BY source) AS ng
      |  FROM documents),
      |p AS (SELECT n_chars AS pv,
      |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rp FROM documents),
      |np AS (SELECT COUNT(*) AS n_p FROM documents),
      |ix AS (SELECT g.doc_id, g.source, g.n_chars,
      |    CASE WHEN g.ng = 1 THEN (np.n_p - 1) // 2 + 1
      |         ELSE ((g.rg - 1) * (np.n_p - 1)) // (g.ng - 1) + 1 END AS q_idx
      |  FROM g CROSS JOIN np)
      |SELECT ix.doc_id, ix.source, ix.n_chars AS raw, p.pv AS norm_value
      |FROM ix JOIN p ON ix.q_idx = p.rp ORDER BY ix.doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // Always-valid sequential p-value (mSPRT)
  // --------------------------------------------------------------------------

  /** Per-event-type always-valid p-value curve for the user-parity A/B over
    * daily cumulative moments ([[Experiment.alwaysValidPValue]], ρ = 1):
    * safe-to-peek sequential testing next to `q_ab_test`'s fixed-horizon z.
    */
  def qAlwaysValid(spark: SparkSession, dir: String): DataFrame =
    Experiment.alwaysValidPValue(
        Tables.events(spark, dir).select(col("event_type"),
          to_date(col("ts")).as("day"),
          when(col("user_id") % 2 === 0, "A").otherwise("B").as("arm"),
          col("value")),
        "event_type", "day", "arm", "value", rho = 1.0)
      .orderBy(col("segment"), col("day"))

  val alwaysValidSql: String =
    """WITH e AS (SELECT event_type AS segment, CAST(ts AS DATE) AS day,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    CAST(ROUND(value * 1000000.0) AS BIGINT) AS vm FROM events),
      |d AS (SELECT segment, day,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS dn_a,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN vm ELSE 0 END) AS HUGEINT)
      |      AS ds1_a,
      |    SUM(CASE WHEN arm = 'A' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END)
      |      AS ds2_a,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS dn_b,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN vm ELSE 0 END) AS HUGEINT)
      |      AS ds1_b,
      |    SUM(CASE WHEN arm = 'B' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END)
      |      AS ds2_b
      |  FROM e GROUP BY 1, 2),
      |c AS (SELECT segment, day,
      |    SUM(dn_a) OVER w AS n_a, SUM(ds1_a) OVER w AS s1_a,
      |    SUM(ds2_a) OVER w AS s2_a,
      |    SUM(dn_b) OVER w AS n_b, SUM(ds1_b) OVER w AS s1_b,
      |    SUM(ds2_b) OVER w AS s2_b
      |  FROM d WINDOW w AS (PARTITION BY segment ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |x AS (SELECT segment, day, CAST(n_a AS BIGINT) AS n_a,
      |    CAST(n_b AS BIGINT) AS n_b,
      |    CAST(s1_a AS DOUBLE) / n_a / 1000000.0 -
      |      CAST(s1_b AS DOUBLE) / n_b / 1000000.0 AS delta,
      |    ((CAST(s2_a AS DOUBLE) -
      |        CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE) / n_a) +
      |     (CAST(s2_b AS DOUBLE) -
      |        CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE) / n_b)) /
      |      (n_a + n_b - 2) / 1000000000000.0 *
      |      (1.0 / n_a + 1.0 / n_b) AS v
      |  FROM c),
      |pp AS (SELECT segment, day, n_a, n_b, delta,
      |    CASE WHEN n_a > 1 AND n_b > 1 AND v > 0.0 THEN
      |      ROUND(LEAST(1.0, 1.0 / (sqrt(v / (v + 1.0)) *
      |        exp(delta * delta * 1.0 / (2.0 * v * (v + 1.0))))), 6)
      |    END AS p_value
      |  FROM x)
      |SELECT segment, day, n_a, n_b, ROUND(delta, 6) AS delta, p_value,
      |  MIN(p_value) OVER (PARTITION BY segment ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_min
      |FROM pp ORDER BY segment, day""".stripMargin

  // --------------------------------------------------------------------------
  // Leave-one-source-out influence
  // --------------------------------------------------------------------------

  /** Per-source LOO influence on the corpus mean document length
    * ([[graft.ext.Importance.looSourceImpact]]).
    */
  def qLooImpact(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Importance.looSourceImpact(Tables.documents(spark, dir),
        "source", "n_chars")
      .withColumnRenamed("src", "source")
      .orderBy(col("source"))

  val looImpactSql: String =
    """WITH g AS (SELECT source AS src, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS s_src
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_tot,
      |    CAST(SUM(s_src) AS BIGINT) AS s_tot FROM g)
      |SELECT src AS source, n_docs,
      |  ROUND(CAST(s_src AS DOUBLE) / n_docs, 6) AS mean_src,
      |  ROUND(CASE WHEN n_tot > n_docs THEN
      |      CAST(s_tot - s_src AS DOUBLE) / (n_tot - n_docs) END, 6)
      |    AS mean_rest,
      |  ROUND(CASE WHEN n_tot > n_docs THEN
      |      CAST(s_tot - s_src AS DOUBLE) / (n_tot - n_docs) END -
      |    CAST(s_tot AS DOUBLE) / n_tot, 6) AS delta
      |FROM g CROSS JOIN t ORDER BY source""".stripMargin

  // --------------------------------------------------------------------------
  // Order-2 Markov next-event model
  // --------------------------------------------------------------------------

  /** P(next | previous two events) per user sequence — the order-2 upgrade of
    * `q_transition_matrix`, with a per-context rank so the top continuation
    * reads off directly. Same shape: one per-user lag window + a
    * context-keyed aggregate; the rank-1 window runs over |contexts| rows.
    */
  def qMarkov2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ctx = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev1", lag(col("event_type"), 1).over(w))
      .withColumn("prev2", lag(col("event_type"), 2).over(w))
      .filter(col("prev1").isNotNull && col("prev2").isNotNull)
      .groupBy(col("prev2"), col("prev1"),
        col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = ctx.groupBy(col("prev2"), col("prev1"))
      .agg(sum(col("n")).as("n_ctx"))
    val rk = Window.partitionBy(col("prev2"), col("prev1"))
      .orderBy(col("n").desc, col("next_type"))
    ctx.join(totals, Seq("prev2", "prev1"))
      .select(col("prev2"), col("prev1"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("n_ctx"), 6).as("p"),
        row_number().over(rk).as("nxt_rank"))
      .orderBy(col("prev2"), col("prev1"), col("nxt_rank"))
  }

  val markov2Sql: String =
    """WITH s AS (SELECT event_type,
      |    lag(event_type, 1) OVER w AS prev1,
      |    lag(event_type, 2) OVER w AS prev2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |c AS (SELECT prev2, prev1, event_type AS next_type, COUNT(*) AS n
      |  FROM s WHERE prev1 IS NOT NULL AND prev2 IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |t AS (SELECT prev2, prev1, CAST(SUM(n) AS BIGINT) AS n_ctx
      |  FROM c GROUP BY 1, 2)
      |SELECT c.prev2, c.prev1, c.next_type, c.n,
      |  ROUND(c.n * 1.0 / t.n_ctx, 6) AS p,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY c.prev2, c.prev1
      |    ORDER BY c.n DESC, c.next_type) AS INT) AS nxt_rank
      |FROM c JOIN t ON c.prev2 = t.prev2 AND c.prev1 = t.prev1
      |ORDER BY c.prev2, c.prev1, nxt_rank""".stripMargin

  // --------------------------------------------------------------------------
  // Join-cardinality audit
  // --------------------------------------------------------------------------

  /** Exact self-join size on lineitem's part key vs the uniform-assumption
    * estimate ([[graft.ext.Profiling.selfJoinCardinality]]) — the skew
    * multiplier a cost model would miss.
    */
  def qJoinCard(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profiling.selfJoinCardinality(
      Tables.lineitem(spark, dir), "l_partkey")

  val joinCardSql: String =
    """WITH k AS (SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
      |s AS (SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
      |    CAST(SUM(c * c) AS BIGINT) AS actual_pairs FROM k)
      |SELECT n_rows, n_keys, actual_pairs,
      |  ROUND(CAST(n_rows AS DOUBLE) * n_rows / n_keys, 6)
      |    AS est_pairs_uniform,
      |  ROUND(CAST(actual_pairs AS DOUBLE) /
      |    (CAST(n_rows AS DOUBLE) * n_rows / n_keys), 6) AS skew_factor
      |FROM s""".stripMargin

  // --------------------------------------------------------------------------
  // Triplet-margin violation rate
  // --------------------------------------------------------------------------

  /** Metric-learning health of the labeled embedding space
    * ([[graft.ext.Embeddings.tripletViolations]], margin 0.05,
    * id-deterministic triplet selection).
    */
  def qTripletViolation(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Embeddings.tripletViolations(Tables.embeddings(spark, dir),
      "vec_id", "embedding", "label", margin = 0.05)

  val tripletViolationSql: String =
    """WITH v AS (SELECT vec_id AS id, embedding AS vec, label AS lbl,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS nv
      |  FROM embeddings),
      |p AS (SELECT id, vec, lbl, nv,
      |    lead(id, 1) OVER (PARTITION BY lbl ORDER BY id) AS pos_id,
      |    lead(id, 1) OVER (ORDER BY id) AS n1_id,
      |    lead(lbl, 1) OVER (ORDER BY id) AS n1_lbl,
      |    lead(id, 2) OVER (ORDER BY id) AS n2_id,
      |    lead(lbl, 2) OVER (ORDER BY id) AS n2_lbl
      |  FROM v),
      |pk AS (SELECT *,
      |    CASE WHEN n1_lbl IS NOT NULL AND n1_lbl <> lbl THEN n1_id
      |         WHEN n2_lbl IS NOT NULL AND n2_lbl <> lbl THEN n2_id
      |    END AS neg_id FROM p),
      |t AS (SELECT pk.id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> pk.vec[i]::DOUBLE * pv.vec[i]::DOUBLE)) /
      |      (pk.nv * pv.nv) AS cos_pos,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> pk.vec[i]::DOUBLE * ng.vec[i]::DOUBLE)) /
      |      (pk.nv * ng.nv) AS cos_neg
      |  FROM pk JOIN v pv ON pk.pos_id = pv.id
      |  JOIN v ng ON pk.neg_id = ng.id
      |  WHERE pk.pos_id IS NOT NULL AND pk.neg_id IS NOT NULL),
      |a AS (SELECT COUNT(*) AS n_anchors FROM v),
      |s AS (SELECT COUNT(*) AS n_triplets,
      |    CAST(SUM(CASE WHEN cos_pos < cos_neg + 0.05 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_violations,
      |    SUM(CAST(cos_pos - cos_neg AS DECIMAL(28,12))) AS gap
      |  FROM t)
      |SELECT n_anchors, n_triplets, n_violations,
      |  ROUND(CAST(n_violations AS DOUBLE) / n_triplets, 6) AS violation_rate,
      |  ROUND(CAST(gap AS DOUBLE) / n_triplets, 6) AS avg_gap
      |FROM a CROSS JOIN s""".stripMargin

  // --------------------------------------------------------------------------
  // Seasonality strength
  // --------------------------------------------------------------------------

  /** Day-of-week seasonality strength per event type: the share of daily
    * volume variance explained by the day-of-week means — the eta² ANOVA
    * decomposition in its all-integer form (SSB/SST from Σn, Σn², per-dow
    * sums; means never materialize, so no double accumulation at any step
    * before the final ratio). strength 1 = perfectly weekly, 0 = no weekly
    * structure; `peak_dow` is the highest-mean day. The companion of
    * `q_seasonal_baseline`, which flags per-day anomalies against the same
    * structure.
    */
  def qSeasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("s_dow"), count(lit(1)).as("c_dow"))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("s_all"),
        sum(col("n") * col("n")).as("ss_all"))
    val rk = Window.partitionBy(col("event_type"))
      .orderBy((col("s_dow").cast("double") / col("c_dow")).desc, col("dow"))
    val dowAgg = byDow
      .withColumn("__rk", row_number().over(rk))
      .groupBy(col("event_type"))
      .agg(sum((col("s_dow").cast("double") * col("s_dow") / col("c_dow"))
          .cast("decimal(28,12)")).as("ssb_dec"),
        max(when(col("__rk") === 1, col("dow"))).as("peak_dow"))
    tot.join(dowAgg, "event_type")
      .select(col("event_type"), col("n_days"),
        round((col("ssb_dec").cast("double") -
          col("s_all").cast("double") * col("s_all") / col("n_days")) /
          (col("ss_all").cast("double") -
            col("s_all").cast("double") * col("s_all") / col("n_days")), 6)
          .as("strength"),
        col("peak_dow"))
      .orderBy(col("event_type"))
  }

  val seasonalStrengthSql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |dw AS (SELECT event_type, n,
      |    CAST(dayofweek(day) + 1 AS BIGINT) AS dow FROM d),
      |b AS (SELECT event_type, dow, CAST(SUM(n) AS BIGINT) AS s_dow,
      |    COUNT(*) AS c_dow FROM dw GROUP BY 1, 2),
      |t AS (SELECT event_type, COUNT(*) AS n_days,
      |    CAST(SUM(n) AS BIGINT) AS s_all,
      |    CAST(SUM(n * n) AS BIGINT) AS ss_all FROM dw GROUP BY 1),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY CAST(s_dow AS DOUBLE) / c_dow DESC, dow) AS rk FROM b),
      |g AS (SELECT event_type,
      |    SUM(CAST(CAST(s_dow AS DOUBLE) * s_dow / c_dow
      |      AS DECIMAL(28,12))) AS ssb_dec,
      |    MAX(CASE WHEN rk = 1 THEN dow END) AS peak_dow
      |  FROM r GROUP BY 1)
      |SELECT t.event_type, t.n_days,
      |  ROUND((CAST(g.ssb_dec AS DOUBLE) -
      |      CAST(t.s_all AS DOUBLE) * t.s_all / t.n_days) /
      |    (CAST(t.ss_all AS DOUBLE) -
      |      CAST(t.s_all AS DOUBLE) * t.s_all / t.n_days), 6) AS strength,
      |  g.peak_dow
      |FROM t JOIN g ON t.event_type = g.event_type
      |ORDER BY t.event_type""".stripMargin

  // --------------------------------------------------------------------------
  // Laspeyres price index
  // --------------------------------------------------------------------------

  /** Monthly Laspeyres price index over parts: base-month quantities weight
    * each month's unit prices, L_t = Σ q₀·p_t / Σ q₀·p₀ over parts traded in
    * both the base month and month t — the classic fixed-basket inflation
    * measure, here over order data. Quantities and cents are exact longs;
    * each part's q₀·p_t term is one deterministic double expression
    * truncated to DECIMAL(28,12) before the sums, so the ratio is
    * partition-order exact. The basket (and the denominator) is re-matched
    * per month to the parts actually traded — the matched-Laspeyres variant
    * that avoids imputing prices for missing parts.
    */
  def qPriceIndex(spark: SparkSession, dir: String): DataFrame = {
    val pm = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
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
    pm.join(basePm, "part")
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_parts"),
        sum((col("q0") * (col("c").cast("double") / col("q")))
          .cast("decimal(28,12)")).as("__num"),
        sum((col("q0") * (col("c0").cast("double") / col("q0")))
          .cast("decimal(28,12)")).as("__den"))
      .select(col("month"), col("n_parts"),
        round(col("__num").cast("double") / col("__den").cast("double"), 6)
          .as("price_index"))
      .orderBy(col("month"))
  }

  val priceIndexSql: String =
    """WITH pm AS (SELECT l_partkey AS part,
      |    date_trunc('month', o_orderdate) AS month,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS c
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |bm AS (SELECT MIN(month) AS base_month FROM pm),
      |b AS (SELECT part, q AS q0, c AS c0 FROM pm CROSS JOIN bm
      |  WHERE month = base_month)
      |SELECT pm.month, COUNT(*) AS n_parts,
      |  ROUND(CAST(SUM(CAST(b.q0 * (CAST(pm.c AS DOUBLE) / pm.q)
      |      AS DECIMAL(28,12))) AS DOUBLE) /
      |    CAST(SUM(CAST(b.q0 * (CAST(b.c0 AS DOUBLE) / b.q0)
      |      AS DECIMAL(28,12))) AS DOUBLE), 6) AS price_index
      |FROM pm JOIN b ON pm.part = b.part
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_boilerplate" -> (qBoilerplate _),
    "q_memorization" -> (qMemorization _),
    "q_power_mde" -> (qPowerMde _),
    "q_conformal" -> (qConformal _),
    "q_communities" -> (qCommunities _),
    "q_log_odds" -> (qLogOdds _),
    "q_eb_shrinkage" -> (qEbShrinkage _),
    "q_skyline" -> (qSkyline _),
    "q_cusum" -> (qCusum _),
    "q_incremental_rollup" -> (qIncrementalRollup _),
    "q_quantile_norm" -> (qQuantileNorm _),
    "q_always_valid" -> (qAlwaysValid _),
    "q_loo_impact" -> (qLooImpact _),
    "q_markov2" -> (qMarkov2 _),
    "q_join_card" -> (qJoinCard _),
    "q_triplet_violation" -> (qTripletViolation _),
    "q_seasonal_strength" -> (qSeasonalStrength _),
    "q_price_index" -> (qPriceIndex _))

  val oracleSql: Map[String, String] = Map(
    "q_boilerplate" -> boilerplateSql,
    "q_memorization" -> memorizationSql,
    "q_power_mde" -> powerMdeSql,
    "q_conformal" -> conformalSql,
    "q_communities" -> communitiesSql,
    "q_log_odds" -> logOddsSql,
    "q_eb_shrinkage" -> ebShrinkageSql,
    "q_skyline" -> skylineSql,
    "q_cusum" -> cusumSql,
    "q_incremental_rollup" -> incrementalRollupSql,
    "q_quantile_norm" -> quantileNormSql,
    "q_always_valid" -> alwaysValidSql,
    "q_loo_impact" -> looImpactSql,
    "q_markov2" -> markov2Sql,
    "q_join_card" -> joinCardSql,
    "q_triplet_violation" -> tripletViolationSql,
    "q_seasonal_strength" -> seasonalStrengthSql,
    "q_price_index" -> priceIndexSql)
}
