package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 query batch: residual product quantization, power-iteration
  * PCA, offline changepoint, SAX motifs, interval concurrency, truncated
  * harmonic centrality, HLL set operations, JSONL round-trip, and the
  * Bloom pre-join audit. Conventions as everywhere: DECIMAL-pooled
  * moments, one fixed-order double formula per readout, ROUND(,6) only on
  * O(1)-magnitude values, deterministic final ORDER BY.
  */
object OmegaQueries {

  // --------------------------------------------------------------------------
  // Residual product quantization
  // --------------------------------------------------------------------------

  private def pqCodebook(spark: SparkSession, dir: String) =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 4)
      .select(col("vec_id").as("code"), col("embedding").as("cvec"))

  /** Residual PQ vs raw PQ, per subspace: quantize v − centroid(v) (the
    * coarse cell from the q_ivf_trained Lloyd round) against a residual
    * codebook and compare pooled MSE with quantizing v directly
    * ([[graft.ext.ProductQuant.residualVectors]]/[[graft.ext.ProductQuant
    * .subspaceMse]]) — the measurement behind FAISS's choice to PQ-encode
    * residuals inside IVF cells. OmegaModulesSpec asserts the residual MSE
    * is lower on clustered data; the oracle replays the Lloyd round, both
    * code assignments and both poolings.
    */
  def qPqResidual(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.{Clustering, ProductQuant}
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cents = Clustering.lloydCentroids(emb, "vec_id", "embedding", seeds,
        "cid", "cvec", iters = 1, dims = 64)
      .localCheckpoint(eager = true) // assignment + residual join read it
    val resid = ProductQuant.residualVectors(emb, "vec_id", "embedding",
      cents).localCheckpoint(eager = true) // codebook slice + encode read it
    val residCb = resid.filter(col("vec_id") < 4)
      .select(col("vec_id").as("code"), col("resid").as("cvec"))
    val rawMse = ProductQuant.subspaceMse(ProductQuant.encode(
      emb, "vec_id", "embedding", pqCodebook(spark, dir), "code", "cvec",
      m = 8, subDim = 8)).withColumnRenamed("mse", "mse_raw")
    val residMse = ProductQuant.subspaceMse(ProductQuant.encode(
      resid, "vec_id", "resid", residCb, "code", "cvec",
      m = 8, subDim = 8)).withColumnRenamed("mse", "mse_resid")
    rawMse.join(residMse, Seq("subspace"))
      .select(col("subspace").cast("long").as("subspace"),
        round(col("mse_raw"), 6).as("mse_raw"),
        round(col("mse_resid"), 6).as("mse_resid"),
        round(col("mse_resid") / col("mse_raw"), 6).as("mse_ratio"))
      .orderBy(col("subspace"))
  }

  val pqResidualSql: String =
    s"""WITH ${TitanQueries.ivfCtesSql},
      |ss AS (SELECT unnest(generate_series(0, 7)) AS s),
      |cb AS (SELECT vec_id AS code, embedding AS ce FROM embeddings
      |  WHERE vec_id < 4),
      |rd0 AS (SELECT v.vec_id, ss.s, cb.code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (v.embedding[ss.s * 8 + i]::DOUBLE
      |              - cb.ce[ss.s * 8 + i]::DOUBLE)
      |         * (v.embedding[ss.s * 8 + i]::DOUBLE
      |              - cb.ce[ss.s * 8 + i]::DOUBLE)))
      |      AS d2
      |  FROM v CROSS JOIN ss CROSS JOIN cb),
      |ra0 AS (SELECT vec_id, s, d2, ROW_NUMBER() OVER
      |    (PARTITION BY vec_id, s ORDER BY d2, code) AS rk FROM rd0),
      |rawm AS (SELECT s,
      |    CAST(SUM(CAST(d2 AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mse_raw
      |  FROM ra0 WHERE rk = 1 GROUP BY 1),
      |rv AS (SELECT v.vec_id,
      |    list_transform(generate_series(1, 64),
      |      i -> v.embedding[i]::DOUBLE - c1.ce[i]) AS r
      |  FROM v JOIN asn2 ON v.vec_id = asn2.vec_id
      |  JOIN c1 ON asn2.cid = c1.cid),
      |rcb AS (SELECT vec_id AS code, r AS rce FROM rv WHERE vec_id < 4),
      |rd1 AS (SELECT rv.vec_id, ss.s, rcb.code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (rv.r[ss.s * 8 + i] - rcb.rce[ss.s * 8 + i])
      |         * (rv.r[ss.s * 8 + i] - rcb.rce[ss.s * 8 + i])))
      |      AS d2
      |  FROM rv CROSS JOIN ss CROSS JOIN rcb),
      |ra1 AS (SELECT vec_id, s, d2, ROW_NUMBER() OVER
      |    (PARTITION BY vec_id, s ORDER BY d2, code) AS rk FROM rd1),
      |resm AS (SELECT s,
      |    CAST(SUM(CAST(d2 AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
      |      AS mse_resid
      |  FROM ra1 WHERE rk = 1 GROUP BY 1)
      |SELECT CAST(s AS BIGINT) AS subspace, ROUND(mse_raw, 6) AS mse_raw,
      |  ROUND(mse_resid, 6) AS mse_resid,
      |  ROUND(mse_resid / mse_raw, 6) AS mse_ratio
      |FROM rawm JOIN resm USING (s) ORDER BY subspace""".stripMargin

  // --------------------------------------------------------------------------
  // Power-iteration top eigenpair of the embedding covariance
  // --------------------------------------------------------------------------

  /** Top principal eigenpair by two deterministic power-iteration rounds
    * ([[graft.ext.Embeddings.powerIterationTopEig]]): per-dim loading of
    * the dominant direction, its eigenvalue, and the share of total
    * variance it explains — the oracle-checkable partner of the MLlib
    * [[graft.ext.Embeddings.pcaProject]].
    */
  def qPcaPower(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Embeddings.powerIterationTopEig(
        Tables.embeddings(spark, dir), "embedding", iters = 2, dims = 64)
      .select(col("dim"), round(col("loading"), 6).as("loading"),
        round(col("lambda"), 6).as("lambda"),
        round(col("explained_share"), 6).as("explained_share"))
      .orderBy(col("dim"))

  val pcaPowerSql: String =
    """WITH ii AS (SELECT unnest(generate_series(1, 64)) AS i),
      |v AS (SELECT vec_id, embedding FROM embeddings),
      |n AS (SELECT COUNT(*) AS n FROM v),
      |mu AS (SELECT ii.i,
      |    CAST(SUM(CAST(v.embedding[ii.i]::DOUBLE AS DECIMAL(18,9)))
      |      AS DOUBLE) / COUNT(*) AS mu
      |  FROM v CROSS JOIN ii GROUP BY 1),
      |muv AS (SELECT list(mu ORDER BY i) AS muv FROM mu),
      |cv AS (SELECT v.vec_id, list_transform(generate_series(1, 64),
      |    i -> v.embedding[i]::DOUBLE - muv.muv[i]) AS c
      |  FROM v CROSS JOIN muv),
      |d1 AS (SELECT vec_id, c,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> c[i] * 1.0)) AS d
      |  FROM cv),
      |w1 AS (SELECT ii.i,
      |    CAST(SUM(CAST(d1.c[ii.i] * d1.d AS DECIMAL(28,12))) AS DOUBLE)
      |      / (SELECT CAST(n AS DOUBLE) FROM n) AS w
      |  FROM d1 CROSS JOIN ii GROUP BY 1),
      |wv1 AS (SELECT list(w ORDER BY i) AS wv FROM w1),
      |l1 AS (SELECT wv,
      |    sqrt(list_sum(list_transform(wv, x -> x * x))) AS l FROM wv1),
      |u1 AS (SELECT list_transform(wv, x -> x / l) AS u FROM l1),
      |d2 AS (SELECT cv.vec_id, cv.c,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> cv.c[i] * u1.u[i])) AS d
      |  FROM cv CROSS JOIN u1),
      |w2 AS (SELECT ii.i,
      |    CAST(SUM(CAST(d2.c[ii.i] * d2.d AS DECIMAL(28,12))) AS DOUBLE)
      |      / (SELECT CAST(n AS DOUBLE) FROM n) AS w
      |  FROM d2 CROSS JOIN ii GROUP BY 1),
      |wv2 AS (SELECT list(w ORDER BY i) AS wv FROM w2),
      |l2 AS (SELECT wv,
      |    sqrt(list_sum(list_transform(wv, x -> x * x))) AS l FROM wv2),
      |u2 AS (SELECT list_transform(wv, x -> x / l) AS u, l FROM l2),
      |tv AS (SELECT CAST(SUM(CAST(cv.c[ii.i] * cv.c[ii.i]
      |      AS DECIMAL(28,12))) AS DOUBLE)
      |      / (SELECT CAST(n AS DOUBLE) FROM n) AS totvar
      |  FROM cv CROSS JOIN ii)
      |SELECT CAST(ii.i AS INT) AS dim, ROUND(u2.u[ii.i], 6) AS loading,
      |  ROUND(u2.l, 6) AS lambda, ROUND(u2.l / tv.totvar, 6)
      |    AS explained_share
      |FROM ii CROSS JOIN u2 CROSS JOIN tv ORDER BY dim""".stripMargin

  // --------------------------------------------------------------------------
  // Offline changepoint: binary-segmentation single split of daily revenue
  // --------------------------------------------------------------------------

  /** Single most likely break in the daily order-revenue series
    * ([[graft.ext.Series.binarySegmentSplit]] over integer-cent daily
    * sums): the split minimizing SSE_left + SSE_right, with segment means
    * in dollars and SSE magnitudes rescaled to 1e12 units so every output
    * stays inside ROUND's stable range.
    */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
        .cast("decimal(18,2)").as("cents"))
    graft.ext.Series.binarySegmentSplit(daily, "day", "cents")
      .select(col("split_day"), col("n_left"), col("n_right"),
        round(col("mean_left") / 100.0, 2).as("mean_left_usd"),
        round(col("mean_right") / 100.0, 2).as("mean_right_usd"),
        round(col("sse_full") / 1.0e12, 6).as("sse_full_e12"),
        round(col("sse_split") / 1.0e12, 6).as("sse_split_e12"),
        round(col("gain_share"), 6).as("gain_share"))
  }

  val changepointSql: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |pref AS (SELECT day, x,
      |    ROW_NUMBER() OVER (ORDER BY day) AS t,
      |    SUM(CAST(x AS HUGEINT)) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS s,
      |    SUM(CAST(x AS HUGEINT) * x) OVER (ORDER BY day ROWS BETWEEN
      |      UNBOUNDED PRECEDING AND CURRENT ROW) AS s2,
      |    LEAD(day, 1) OVER (ORDER BY day) AS next_day
      |  FROM daily),
      |tot AS (SELECT MAX(t) AS n, MAX(s) AS sn, MAX(s2) AS s2n FROM pref),
      |cand AS (SELECT p.t, p.next_day, p.s, p.s2, tot.n, tot.sn, tot.s2n,
      |    (CAST(p.s2 AS DOUBLE)
      |       - CAST(p.s AS DOUBLE) * CAST(p.s AS DOUBLE) / CAST(p.t AS DOUBLE))
      |    + ((CAST(tot.s2n AS DOUBLE) - CAST(p.s2 AS DOUBLE))
      |       - (CAST(tot.sn AS DOUBLE) - CAST(p.s AS DOUBLE))
      |         * (CAST(tot.sn AS DOUBLE) - CAST(p.s AS DOUBLE))
      |         / (CAST(tot.n AS DOUBLE) - CAST(p.t AS DOUBLE))) AS cost
      |  FROM pref p CROSS JOIN tot WHERE p.t < tot.n),
      |best AS (SELECT * FROM cand ORDER BY cost, t LIMIT 1)
      |SELECT next_day AS split_day, CAST(t AS BIGINT) AS n_left,
      |  CAST(n - t AS BIGINT) AS n_right,
      |  ROUND(CAST(s AS DOUBLE) / CAST(t AS DOUBLE) / 100.0, 2)
      |    AS mean_left_usd,
      |  ROUND((CAST(sn AS DOUBLE) - CAST(s AS DOUBLE))
      |    / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) / 100.0, 2)
      |    AS mean_right_usd,
      |  ROUND((CAST(s2n AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
      |    / CAST(n AS DOUBLE)) / 1000000000000.0, 6) AS sse_full_e12,
      |  ROUND(cost / 1000000000000.0, 6) AS sse_split_e12,
      |  ROUND(1.0 - cost / (CAST(s2n AS DOUBLE) - CAST(sn AS DOUBLE)
      |    * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gain_share
      |FROM best""".stripMargin

  // --------------------------------------------------------------------------
  // SAX motifs of the daily revenue series
  // --------------------------------------------------------------------------

  /** SAX motif profile ([[graft.ext.Series.saxMotifs]], 7-day PAA frames,
    * 3-symbol words over the quartile alphabet) of daily order revenue —
    * does the series repeat weekly shapes?
    */
  def qSaxMotifs(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
        .cast("decimal(18,2)").as("cents"))
    graft.ext.Series.saxMotifs(daily, "day", "cents", paaWidth = 7,
        wordLen = 3)
      .orderBy(col("n_occurrences").desc, col("word"))
  }

  val saxMotifsSql: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |base AS (SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS t
      |  FROM daily),
      |m AS (SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS sx,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM base),
      |paa AS (SELECT (t - 1) // 7 AS frame, SUM(x) AS fs, COUNT(*) AS fn
      |  FROM base GROUP BY 1),
      |z AS (SELECT frame,
      |    (CAST(fs AS DOUBLE) / CAST(fn AS DOUBLE)
      |      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |    / sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS z
      |  FROM paa CROSS JOIN m),
      |sym AS (SELECT frame,
      |    CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
      |         WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS s
      |  FROM z),
      |words AS (SELECT s
      |    || LEAD(s, 1) OVER (ORDER BY frame)
      |    || LEAD(s, 2) OVER (ORDER BY frame) AS word
      |  FROM sym)
      |SELECT word, COUNT(*) AS n_occurrences FROM words
      |WHERE length(word) = 3 GROUP BY 1
      |ORDER BY n_occurrences DESC, word""".stripMargin

  // --------------------------------------------------------------------------
  // Interval concurrency: orders in flight
  // --------------------------------------------------------------------------

  /** Peak orders-in-flight per month ([[graft.ext.EventStats
    * .intervalConcurrency]]): each order is open from o_orderdate to its
    * last lineitem ship date; the +1/−1 day sweep reports every month's
    * maximum concurrency and first peak day.
    */
  def qMaxConcurrent(spark: SparkSession, dir: String): DataFrame = {
    // the synthetic generator draws o_orderdate and l_shipdate
    // independently, so an "order" can postdate its last shipment —
    // normalize each span to [least, greatest] before the sweep
    val spans = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("d2"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d1")),
        Seq("o_orderkey"))
      .select(least(col("d1"), col("d2")).as("start"),
        greatest(col("d1"), col("d2")).as("ship_end"))
    graft.ext.EventStats.intervalConcurrency(spans, "start", "ship_end")
  }

  val maxConcurrentSql: String =
    """WITH spans0 AS (SELECT l.l_orderkey,
      |    CAST(o.o_orderdate AS DATE) AS d1,
      |    MAX(CAST(l.l_shipdate AS DATE)) AS d2
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2),
      |spans AS (SELECT l_orderkey, LEAST(d1, d2) AS s,
      |    GREATEST(d1, d2) AS e FROM spans0),
      |ev AS (SELECT s AS day, 1 AS d FROM spans
      |  UNION ALL SELECT e + INTERVAL 1 DAY, -1 FROM spans),
      |net AS (SELECT day, CAST(SUM(d) AS BIGINT) AS net FROM ev GROUP BY 1),
      |open AS (SELECT day,
      |    SUM(net) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
      |      CURRENT ROW) AS open
      |  FROM net),
      |rk AS (SELECT strftime(day, '%Y-%m') AS month, day, open,
      |    ROW_NUMBER() OVER (PARTITION BY strftime(day, '%Y-%m')
      |      ORDER BY open DESC, day) AS rn
      |  FROM open)
      |SELECT month, CAST(open AS BIGINT) AS max_open, CAST(day AS DATE)
      |    AS peak_day
      |FROM rk WHERE rn = 1 ORDER BY month""".stripMargin

  // --------------------------------------------------------------------------
  // Truncated harmonic centrality of co-purchase hubs
  // --------------------------------------------------------------------------

  /** Harmonic centrality of the 5 smallest part ids in the repeat
    * co-purchase graph, truncated at 3 hops ([[graft.ext.GraphPaths
    * .harmonicCentrality]]) — one simultaneous multi-source BFS.
    */
  def qHarmonicCentrality(spark: SparkSession, dir: String): DataFrame =
    graft.ext.GraphPaths.harmonicCentrality(
        SummitQueries.copurchaseEdges(spark, dir), "src", "dst", nSeeds = 5)
      .select(col("seed"), col("n_d1"), col("n_d2"), col("n_d3"),
        round(col("harmonic"), 6).as("harmonic"))
      .orderBy(col("seed"))

  val harmonicCentralitySql: String =
    """WITH e0 AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
      |    COUNT(DISTINCT x.l_orderkey) AS w
      |  FROM lineitem x JOIN lineitem y
      |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT x.l_orderkey) >= 2),
      |sym AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
      |seeds AS (SELECT DISTINCT u AS node FROM sym ORDER BY node LIMIT 5),
      |d0 AS (SELECT node AS seed, node AS id FROM seeds),
      |f1 AS (SELECT DISTINCT d0.seed, s.v AS id
      |  FROM d0 JOIN sym s ON d0.id = s.u),
      |d1 AS (SELECT seed, id FROM f1 EXCEPT SELECT seed, id FROM d0),
      |f2 AS (SELECT DISTINCT d1.seed, s.v AS id
      |  FROM d1 JOIN sym s ON d1.id = s.u),
      |d2 AS (SELECT seed, id FROM f2
      |  EXCEPT SELECT seed, id FROM d0
      |  EXCEPT SELECT seed, id FROM d1),
      |f3 AS (SELECT DISTINCT d2.seed, s.v AS id
      |  FROM d2 JOIN sym s ON d2.id = s.u),
      |d3 AS (SELECT seed, id FROM f3
      |  EXCEPT SELECT seed, id FROM d0
      |  EXCEPT SELECT seed, id FROM d1
      |  EXCEPT SELECT seed, id FROM d2),
      |cnt AS (SELECT seed,
      |    CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
      |    CAST(SUM(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_d2,
      |    CAST(SUM(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_d3
      |  FROM (SELECT seed, id, 1 AS dist FROM d1
      |    UNION ALL SELECT seed, id, 2 FROM d2
      |    UNION ALL SELECT seed, id, 3 FROM d3)
      |  GROUP BY 1)
      |SELECT seed, n_d1, n_d2, n_d3,
      |  ROUND(CAST(n_d1 AS DOUBLE) + CAST(n_d2 AS DOUBLE) / 2.0
      |    + CAST(n_d3 AS DOUBLE) / 3.0, 6) AS harmonic
      |FROM cnt ORDER BY seed""".stripMargin

  // --------------------------------------------------------------------------
  // HLL set operations: repeat customers across years
  // --------------------------------------------------------------------------

  /** HLL union/intersection estimates vs exact for the customer sets
    * ordering in 1996 vs 1997 ([[graft.ext.Sketches.hllIntersectAudit]],
    * b=6): the register-max merge and the inclusion-exclusion intersection
    * a 100 TB overlap job would run on sketches alone.
    */
  def qHllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
    graft.ext.Sketches.hllIntersectAudit(
        o.filter(col("yr") === 1996), o.filter(col("yr") === 1997),
        "o_custkey", b = 6)
      .select(col("m"), round(col("est_a"), 6).as("est_a"),
        round(col("est_b"), 6).as("est_b"),
        round(col("est_union"), 6).as("est_union"),
        round(col("est_intersect"), 6).as("est_intersect"),
        col("true_intersect"),
        round(col("jaccard_est"), 6).as("jaccard_est"),
        round(col("jaccard_true"), 6).as("jaccard_true"))
  }

  val hllIntersectSql: String = {
    // one register CTE chain per set; estimator = the q_hll_estimate math
    // (rho = 27 - bitlength(w) for b=6; 27 when w = 0)
    def regs(src: String, tag: String): String =
      s"""h_$tag AS (SELECT CAST(('0x' ||
        |      substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
        |      AS h FROM $src),
        |g_$tag AS (SELECT h % 64 AS idx,
        |    MAX(CASE WHEN h // 64 = 0 THEN 27
        |      ELSE 27 - len(bin(h // 64)) END) AS mreg
        |  FROM h_$tag GROUP BY 1)""".stripMargin
    def est(tag: String): String =
      s"""z_$tag AS (SELECT SUM(power(2.0, -CAST(mreg AS DOUBLE))) AS zsum,
        |    CAST(SUM(CASE WHEN mreg = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_empty
        |  FROM (SELECT sp.idx, COALESCE(g_$tag.mreg, 0) AS mreg
        |    FROM sp LEFT JOIN g_$tag ON sp.idx = g_$tag.idx)),
        |e_$tag AS (SELECT CASE
        |    WHEN 0.709 * (64.0 * 64.0) / zsum <= 160.0 AND v_empty > 0
        |      THEN 64.0 * ln(64.0 / CAST(v_empty AS DOUBLE))
        |    ELSE 0.709 * (64.0 * 64.0) / zsum END AS est
        |  FROM z_$tag)""".stripMargin
    s"""WITH a0 AS (SELECT o_custkey FROM orders
      |  WHERE year(o_orderdate) = 1996),
      |b0 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
      |sp AS (SELECT unnest(generate_series(0, 63)) AS idx),
      |${regs("a0", "a")},
      |${regs("b0", "b")},
      |g_u AS (SELECT idx, MAX(mreg) AS mreg FROM
      |  (SELECT * FROM g_a UNION ALL SELECT * FROM g_b) GROUP BY 1),
      |${est("a")},
      |${est("b")},
      |${est("u")},
      |ex AS (SELECT
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM a0
      |       INTERSECT SELECT DISTINCT o_custkey FROM b0)) AS true_intersect,
      |    (SELECT COUNT(*) FROM (SELECT o_custkey FROM a0
      |       UNION SELECT o_custkey FROM b0)) AS true_union)
      |SELECT CAST(64 AS INT) AS m, ROUND(e_a.est, 6) AS est_a,
      |  ROUND(e_b.est, 6) AS est_b, ROUND(e_u.est, 6) AS est_union,
      |  ROUND(GREATEST(0.0, e_a.est + e_b.est - e_u.est), 6)
      |    AS est_intersect,
      |  CAST(ex.true_intersect AS BIGINT) AS true_intersect,
      |  ROUND(GREATEST(0.0, e_a.est + e_b.est - e_u.est) / e_u.est, 6)
      |    AS jaccard_est,
      |  CASE WHEN ex.true_union > 0
      |    THEN ROUND(CAST(ex.true_intersect AS DOUBLE)
      |      / CAST(ex.true_union AS DOUBLE), 6) END AS jaccard_true
      |FROM e_a CROSS JOIN e_b CROSS JOIN e_u CROSS JOIN ex""".stripMargin
  }

  // --------------------------------------------------------------------------
  // JSONL round-trip digest
  // --------------------------------------------------------------------------

  /** JSON Lines write→read round-trip of the orders slice, digested per
    * month ([[graft.sources.Formats.jsonlRoundtrip]]) — same lossless
    * proof as q_orc_roundtrip/q_csv_roundtrip, for the interchange format
    * LLM corpora actually ship in.
    */
  def qJsonlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    TitanQueries.digestOf(graft.sources.Formats.jsonlRoundtrip(
      TitanQueries.ordersDigestFrame(spark, dir),
      Scratch.path(spark, "jsonl", dir)))

  // --------------------------------------------------------------------------
  // Bloom pre-join audit
  // --------------------------------------------------------------------------

  /** Runtime-filter sizing audit ([[graft.ext.Sketches.bloomPrejoinAudit]]):
    * a Bloom filter over one brand's part keys probed by every lineitem
    * row — how many fact rows the dim-side filter would keep off the
    * shuffle, and how many false positives leak through.
    */
  def qBloomPrejoin(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Sketches.bloomPrejoinAudit(
        Tables.lineitem(spark, dir), col("l_partkey"),
        Tables.part(spark, dir).filter(col("p_brand") === "Brand#23"),
        col("p_partkey"), wWords = 64, kHashes = 4)
      .withColumn("reduction_pct", round(col("reduction_pct"), 6))

  val bloomPrejoinSql: String =
    """WITH dimk AS (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS key
      |  FROM part WHERE p_brand = 'Brand#23'),
      |ip AS (SELECT key, unnest(generate_series(0, 3)) AS j FROM dimk),
      |ipos AS (SELECT key,
      |    ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || key), 1, 8))
      |      ::BIGINT % 2048 AS pos
      |  FROM ip),
      |fw AS (SELECT pos // 32 AS word,
      |    BIT_OR(CAST(POWER(2, pos % 32) AS BIGINT)) AS bits
      |  FROM ipos GROUP BY 1),
      |fk AS (SELECT CAST(l_partkey AS VARCHAR) AS key, COUNT(*) AS nr
      |  FROM lineitem GROUP BY 1),
      |pp AS (SELECT key, unnest(generate_series(0, 3)) AS j FROM fk),
      |ppos AS (SELECT key,
      |    ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || key), 1, 8))
      |      ::BIGINT % 2048 AS pos
      |  FROM pp),
      |pw AS (SELECT key, pos // 32 AS word,
      |    CAST(POWER(2, pos % 32) AS BIGINT) AS mask FROM ppos),
      |hits AS (SELECT pw.key,
      |    SUM(CASE WHEN fw.bits IS NOT NULL AND (fw.bits & pw.mask) = pw.mask
      |      THEN 1 ELSE 0 END) AS n_hit
      |  FROM pw LEFT JOIN fw USING (word) GROUP BY 1),
      |pass AS (SELECT key, n_hit = 4 AS p FROM hits),
      |truth AS (SELECT key, TRUE AS in_dim FROM dimk),
      |agg AS (SELECT
      |    CAST(SUM(fk.nr) AS BIGINT) AS n_fact_rows,
      |    COUNT(*) AS n_fact_keys,
      |    CAST(SUM(CASE WHEN pass.p THEN fk.nr ELSE 0 END) AS BIGINT)
      |      AS n_pass_rows,
      |    CAST(SUM(CASE WHEN truth.in_dim IS NOT NULL THEN fk.nr ELSE 0 END)
      |      AS BIGINT) AS n_true_rows,
      |    CAST(SUM(CASE WHEN pass.p AND truth.in_dim IS NULL THEN fk.nr
      |      ELSE 0 END) AS BIGINT) AS n_fp_rows
      |  FROM fk JOIN pass USING (key) LEFT JOIN truth USING (key))
      |SELECT n_fact_rows, n_fact_keys, n_pass_rows, n_true_rows, n_fp_rows,
      |  ROUND(100.0 * (1.0 - CAST(n_pass_rows AS DOUBLE)
      |    / CAST(n_fact_rows AS DOUBLE)), 6) AS reduction_pct
      |FROM agg""".stripMargin

  // --------------------------------------------------------------------------
  // Batched IVFPQ serve
  // --------------------------------------------------------------------------

  /** Many-queries-one-job IVFPQ serve
    * ([[graft.ext.SimSearch.ivfPqProbeTopKForQueries]]): vecs 0/1/2 each
    * resolve their 2 nearest learned cells, ADC-score only those cells'
    * code rows against their own broadcast LUT slice, shortlist 20 by
    * approximate distance, exact-rerank to top-5 — the production batch
    * shape of q_ivfpq_topk. The probed-cell union reaches the reads as a
    * STATIC partition filter.
    */
  def qIvfPqBatch(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.SimSearch
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val path = Scratch.path(spark, "ivfpq_batch", dir)
    SimSearch.ivfPqWriteIndex(emb, "vec_id", "embedding", seeds,
      "cid", "cvec", iters = 1, pqCodebook(spark, dir), "code", "cvec",
      path, m = 8, subDim = 8)
    val queries = emb.filter(col("vec_id") < 3)
    SimSearch.ivfPqProbeTopKForQueries(spark, path, queries,
        "vec_id", "embedding", k = 5, nProbe = 2, shortlist = 20)
      .select(col("query_id"), col("vec_id"),
        col("ivf_cell").cast("long").as("ivf_cell"),
        round(col("adc_dist"), 6).as("adc_dist"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }

  val ivfPqBatchSql: String =
    s"""WITH ${TitanQueries.ivfCtesSql},
      |qs AS (SELECT vec_id AS query_id, embedding AS qe, nv AS qn FROM v
      |  WHERE vec_id IN (0, 1, 2)),
      |prk AS (SELECT qs.query_id, cn1.cid, ROW_NUMBER() OVER (
      |    PARTITION BY qs.query_id ORDER BY
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> (cn1.ce[i] - qs.qe[i]::DOUBLE)
      |         * (cn1.ce[i] - qs.qe[i]::DOUBLE))), cn1.cid) AS rk
      |  FROM qs CROSS JOIN cn1),
      |probes2 AS (SELECT query_id, cid FROM prk WHERE rk <= 2),
      |ss AS (SELECT unnest(generate_series(0, 7)) AS s),
      |cb AS (SELECT vec_id AS code, embedding AS ce FROM embeddings
      |  WHERE vec_id < 4),
      |candv AS (SELECT p.query_id, a.vec_id, a.cid
      |  FROM asn2 a JOIN probes2 p ON a.cid = p.cid
      |  WHERE a.vec_id <> p.query_id),
      |cvd AS (SELECT DISTINCT vec_id FROM candv),
      |pdd AS (SELECT c.vec_id, ss.s, cb.code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (v.embedding[ss.s * 8 + i]::DOUBLE
      |              - cb.ce[ss.s * 8 + i]::DOUBLE)
      |         * (v.embedding[ss.s * 8 + i]::DOUBLE
      |              - cb.ce[ss.s * 8 + i]::DOUBLE)))
      |      AS d2
      |  FROM cvd c JOIN v ON c.vec_id = v.vec_id
      |  CROSS JOIN ss CROSS JOIN cb),
      |pa AS (SELECT vec_id, s, code, ROW_NUMBER() OVER
      |    (PARTITION BY vec_id, s ORDER BY d2, code) AS rk FROM pdd),
      |asnc AS (SELECT vec_id, s, code FROM pa WHERE rk = 1),
      |lut AS (SELECT qs.query_id, ss.s, cb.code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (qs.qe[ss.s * 8 + i]::DOUBLE - cb.ce[ss.s * 8 + i]::DOUBLE)
      |         * (qs.qe[ss.s * 8 + i]::DOUBLE
      |              - cb.ce[ss.s * 8 + i]::DOUBLE)))
      |      AS dq2
      |  FROM qs CROSS JOIN ss CROSS JOIN cb),
      |adc AS (SELECT cv.query_id, cv.vec_id, cv.cid AS ivf_cell,
      |    CAST(SUM(CAST(l.dq2 AS DECIMAL(18,9))) AS DOUBLE) AS adc_raw
      |  FROM candv cv JOIN asnc a ON cv.vec_id = a.vec_id
      |  JOIN lut l ON l.query_id = cv.query_id AND l.s = a.s
      |    AND l.code = a.code
      |  GROUP BY 1, 2, 3),
      |shr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY adc_raw, vec_id) AS sr FROM adc),
      |sh2 AS (SELECT query_id, vec_id, ivf_cell, adc_raw FROM shr
      |  WHERE sr <= 20),
      |rr AS (SELECT s.query_id, s.vec_id, s.ivf_cell, s.adc_raw,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> v.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) / (v.nv * q.qn)
      |      AS cos_raw
      |  FROM sh2 s JOIN v ON s.vec_id = v.vec_id
      |  JOIN qs q ON s.query_id = q.query_id),
      |rk2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos_raw DESC, vec_id) AS kr FROM rr)
      |SELECT query_id, vec_id, ivf_cell, ROUND(adc_raw, 6) AS adc_dist,
      |  ROUND(cos_raw, 6) AS cosine
      |FROM rk2 WHERE kr <= 5
      |ORDER BY query_id, cos_raw DESC, vec_id""".stripMargin

  // --------------------------------------------------------------------------
  // Personalized PageRank from seed parts
  // --------------------------------------------------------------------------

  /** Proximity-to-seeds ranking over the weighted co-purchase graph
    * ([[graft.ext.PageRank.personalizedPageRank]], 3 rounds, d=0.85,
    * teleport uniform over the 3 smallest part ids): the graph-native
    * "more like these" expansion. Top-20 by score.
    */
  def qPpr(spark: SparkSession, dir: String): DataFrame = {
    // Materialize the co-purchase pair table once: the union's two projections
    // and the two checkpoints inside personalizedPageRank (edge table, seed
    // set) otherwise each re-execute the whole basket-pair pipeline.
    val e = SummitQueries.copurchaseEdges(spark, dir)
      .localCheckpoint(eager = true)
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst"),
      col("w")))
    val seeds = sym.select(col("src").as("node")).distinct()
      .orderBy(col("node")).limit(3)
    graft.ext.PageRank.personalizedPageRank(sym, "src", "dst", "w", seeds,
        "node", iterations = 3, damping = 0.85)
      .orderBy(col("ppr").desc, col("node"))
      .limit(20)
      .select(col("node"), round(col("ppr"), 6).as("ppr"))
  }

  val pprSql: String =
    """WITH e0 AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
      |    COUNT(DISTINCT x.l_orderkey) AS w
      |  FROM lineitem x JOIN lineitem y
      |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT x.l_orderkey) >= 2),
      |sym AS (SELECT a AS src, b AS dst, w FROM e0
      |  UNION ALL SELECT b, a, w FROM e0),
      |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM sym
      |  GROUP BY 1),
      |seeds AS (SELECT DISTINCT src AS node FROM sym ORDER BY node LIMIT 3),
      |ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM seeds),
      |p0 AS (SELECT node, 1.0 / (SELECT k FROM ns) AS ppr FROM seeds),
      |c1 AS (SELECT s.dst AS node,
      |    CAST(SUM(CAST(p.ppr * s.w / o.outw AS DECIMAL(28,15))) AS DOUBLE)
      |      AS s
      |  FROM sym s JOIN p0 p ON s.src = p.node JOIN outw o
      |    ON s.src = o.src GROUP BY 1),
      |p1 AS (SELECT COALESCE(c.node, sd.node) AS node,
      |    CASE WHEN sd.node IS NOT NULL
      |      THEN (1.0 - 0.85) * (1.0 / (SELECT k FROM ns)) ELSE 0.0 END
      |    + 0.85 * COALESCE(c.s, 0.0) AS ppr
      |  FROM c1 c FULL JOIN seeds sd ON c.node = sd.node),
      |c2 AS (SELECT s.dst AS node,
      |    CAST(SUM(CAST(p.ppr * s.w / o.outw AS DECIMAL(28,15))) AS DOUBLE)
      |      AS s
      |  FROM sym s JOIN p1 p ON s.src = p.node JOIN outw o
      |    ON s.src = o.src GROUP BY 1),
      |p2 AS (SELECT COALESCE(c.node, sd.node) AS node,
      |    CASE WHEN sd.node IS NOT NULL
      |      THEN (1.0 - 0.85) * (1.0 / (SELECT k FROM ns)) ELSE 0.0 END
      |    + 0.85 * COALESCE(c.s, 0.0) AS ppr
      |  FROM c2 c FULL JOIN seeds sd ON c.node = sd.node),
      |c3 AS (SELECT s.dst AS node,
      |    CAST(SUM(CAST(p.ppr * s.w / o.outw AS DECIMAL(28,15))) AS DOUBLE)
      |      AS s
      |  FROM sym s JOIN p2 p ON s.src = p.node JOIN outw o
      |    ON s.src = o.src GROUP BY 1),
      |p3 AS (SELECT COALESCE(c.node, sd.node) AS node,
      |    CASE WHEN sd.node IS NOT NULL
      |      THEN (1.0 - 0.85) * (1.0 / (SELECT k FROM ns)) ELSE 0.0 END
      |    + 0.85 * COALESCE(c.s, 0.0) AS ppr
      |  FROM c3 c FULL JOIN seeds sd ON c.node = sd.node)
      |SELECT node, ROUND(ppr, 6) AS ppr FROM p3 WHERE ppr > 0
      |ORDER BY p3.ppr DESC, node LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // b-bit MinHash audit
  // --------------------------------------------------------------------------

  /** b-bit MinHash estimator audit over the LSH candidate pairs
    * ([[graft.ext.Dedup.bbitMinhashPairs]]): full-signature vs 2-bit vs
    * 1-bit Jaccard estimates next to the exact shingle Jaccard — the
    * storage-vs-variance sweep before shrinking a 100 TB signature store.
    */
  def qBbitMinhash(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Dedup.bbitMinhashPairs(Tables.documents(spark, dir),
        "doc_id", "text", k = 3, numHashes = 16, rowsPerBand = 4)
      .select(col("id_a"), col("id_b"),
        round(col("est_full"), 6).as("est_full"),
        round(col("est_b2"), 6).as("est_b2"),
        round(col("est_b1"), 6).as("est_b1"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))

  val bbitMinhashSql: String = {
    def matchFrac(expr: Int => String): String =
      (0 until 16).map(j =>
        s"CASE WHEN ${expr(j)} THEN 1.0 ELSE 0.0 END")
        .mkString("(", " + ", ") / 16")
    val full = matchFrac(j => s"a.mh_$j = b.mh_$j")
    val b2 = matchFrac(j => s"a.mh_$j % 4 = b.mh_$j % 4")
    val b1 = matchFrac(j => s"a.mh_$j % 2 = b.mh_$j % 2")
    s"""WITH ${ExtQueries.minhashPairCtesSql},
      |est AS (SELECT c.id_a, c.id_b, $full AS est_full,
      |    ($b2 - 0.25) / 0.75 AS est_b2,
      |    ($b1 - 0.5) / 0.5 AS est_b1
      |  FROM cand c JOIN sig a ON c.id_a = a.doc_id
      |  JOIN sig b ON c.id_b = b.doc_id)
      |SELECT j.id_a, j.id_b, ROUND(est.est_full, 6) AS est_full,
      |  ROUND(est.est_b2, 6) AS est_b2, ROUND(est.est_b1, 6) AS est_b1,
      |  ROUND(j.jaccard, 6) AS jaccard
      |FROM j JOIN est ON j.id_a = est.id_a AND j.id_b = est.id_b
      |ORDER BY j.id_a, j.id_b""".stripMargin
  }

  // --------------------------------------------------------------------------
  // Brier decomposition of the quality-score forecast
  // --------------------------------------------------------------------------

  /** Murphy decomposition of the hashed-linear quality score treated as a
    * forecast of the Gopher keep decision ([[graft.ext.Experiment
    * .brierDecomposition]], 20 bins): reliability / resolution /
    * uncertainty plus the within-bin variance gap — the readout that says
    * whether recalibrating the score (REL) or retraining it (RES) is the
    * lever. Forecasts enter at ROUND 6 on both engines.
    */
  def qBrierDecomp(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.TextQuality
    val docs = Tables.documents(spark, dir)
    val s = TextQuality.hashedLinearScore(docs, "doc_id", "text")
      .select(col("doc_id"), round(col("score"), 6).as("score"))
    val g = TextQuality.gopherSignals(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep"))
    graft.ext.Experiment.brierDecomposition(s.join(g, "doc_id"),
        "score", "keep", bins = 20)
      .select(col("n"), round(col("brier"), 6).as("brier"),
        round(col("reliability"), 6).as("reliability"),
        round(col("resolution"), 6).as("resolution"),
        round(col("uncertainty"), 6).as("uncertainty"),
        round(col("decomp_gap"), 6).as("decomp_gap"))
  }

  val brierDecompSql: String =
    s"""WITH ${FrontierQueries.calibScoreKeepCtes},
      |rows0 AS (SELECT sc.score AS p,
      |    CASE WHEN g.keep THEN 1 ELSE 0 END AS o,
      |    CAST(LEAST(19, FLOOR(sc.score * 20)) AS INT) AS bin
      |  FROM sc JOIN g USING (doc_id)),
      |tot AS (SELECT COUNT(*) AS n, CAST(SUM(o) AS BIGINT) AS son,
      |    SUM(CAST((p - CAST(o AS DOUBLE)) * (p - CAST(o AS DOUBLE))
      |      AS DECIMAL(27,12))) AS sbs
      |  FROM rows0),
      |gb AS (SELECT bin, COUNT(*) AS nk,
      |    SUM(CAST(p AS DECIMAL(27,12))) AS sp,
      |    CAST(SUM(o) AS BIGINT) AS so
      |  FROM rows0 GROUP BY 1),
      |terms AS (SELECT tot.n, tot.son, tot.sbs,
      |    SUM(CAST(CAST(nk AS DOUBLE) *
      |      ((CAST(sp AS DOUBLE) / CAST(nk AS DOUBLE)
      |          - CAST(so AS DOUBLE) / CAST(nk AS DOUBLE))
      |       * (CAST(sp AS DOUBLE) / CAST(nk AS DOUBLE)
      |          - CAST(so AS DOUBLE) / CAST(nk AS DOUBLE)))
      |      AS DECIMAL(28,12))) AS srel,
      |    SUM(CAST(CAST(nk AS DOUBLE) *
      |      ((CAST(so AS DOUBLE) / CAST(nk AS DOUBLE)
      |          - CAST(son AS DOUBLE) / CAST(n AS DOUBLE))
      |       * (CAST(so AS DOUBLE) / CAST(nk AS DOUBLE)
      |          - CAST(son AS DOUBLE) / CAST(n AS DOUBLE)))
      |      AS DECIMAL(28,12))) AS sres
      |  FROM gb CROSS JOIN tot GROUP BY 1, 2, 3)
      |SELECT n, ROUND(CAST(sbs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS brier,
      |  ROUND(CAST(srel AS DOUBLE) / CAST(n AS DOUBLE), 6) AS reliability,
      |  ROUND(CAST(sres AS DOUBLE) / CAST(n AS DOUBLE), 6) AS resolution,
      |  ROUND((CAST(son AS DOUBLE) / CAST(n AS DOUBLE))
      |    * (1.0 - CAST(son AS DOUBLE) / CAST(n AS DOUBLE)), 6)
      |    AS uncertainty,
      |  ROUND(CAST(sbs AS DOUBLE) / CAST(n AS DOUBLE)
      |    - (CAST(srel AS DOUBLE) / CAST(n AS DOUBLE)
      |       - CAST(sres AS DOUBLE) / CAST(n AS DOUBLE)
      |       + (CAST(son AS DOUBLE) / CAST(n AS DOUBLE))
      |         * (1.0 - CAST(son AS DOUBLE) / CAST(n AS DOUBLE))), 6)
      |    AS decomp_gap
      |FROM terms""".stripMargin

  // --------------------------------------------------------------------------
  // Prefix-hierarchy rollup of part types
  // --------------------------------------------------------------------------

  /** Revenue rollup at every word-prefix depth of p_type
    * ([[graft.ext.Hierarchy.prefixRollup]]): the taxonomy-from-strings
    * OLAP shape ("STANDARD" ⊃ "STANDARD BRUSHED" ⊃ ...), exact
    * integer-cent totals.
    */
  def qTypePrefixRollup(spark: SparkSession, dir: String): DataFrame = {
    val partRev = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
        .as("rev_cents"))
      .join(Tables.part(spark, dir)
        .select(col("p_partkey").as("l_partkey"), col("p_type")),
        Seq("l_partkey"))
    graft.ext.Hierarchy.prefixRollup(partRev, "p_type", "rev_cents",
        sep = " ", maxLevels = 3)
      .withColumnRenamed("n_rows", "n_parts")
      .withColumnRenamed("total", "rev_cents")
      .orderBy(col("level"), col("prefix"))
  }

  val typePrefixRollupSql: String =
    """WITH pr AS (SELECT l.l_partkey,
      |    CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS rev,
      |    MAX(p.p_type) AS p_type
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1),
      |w AS (SELECT rev, string_split(p_type, ' ') AS ws FROM pr),
      |px AS (SELECT lvl.l AS level,
      |    array_to_string(ws[1:lvl.l], ' ') AS prefix, rev
      |  FROM w CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS l) lvl
      |  WHERE len(ws) >= lvl.l)
      |SELECT CAST(level AS INT) AS level, prefix, COUNT(*) AS n_parts,
      |  CAST(SUM(rev) AS BIGINT) AS rev_cents
      |FROM px GROUP BY 1, 2 ORDER BY level, prefix""".stripMargin

  // --------------------------------------------------------------------------
  // Quantile treatment effects
  // --------------------------------------------------------------------------

  /** Per-arm exact purchase-value quantiles via ONE distributed global
    * ranking ([[graft.ext.GlobalRank.groupedExactQuantiles]] — groups
    * contiguous in rank space, no per-arm single-task sort): the
    * quantile-level readout of the A/B split that q_ab_test's means
    * average away.
    */
  def qQte(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.ext.Splits.hashBucket(col("user_id")) % 2 === 0,
          lit("A")).otherwise(lit("B")).as("arm"),
        round(col("value") * 1000000.0, 0).cast("long").as("vm"),
        col("user_id"))
    graft.ext.GlobalRank.groupedExactQuantiles(e, "arm", "vm",
        Seq("user_id"), probs = Seq(0.25, 0.5, 0.75, 0.9))
      .select(col("arm"), col("p"),
        round(col("value") / 1000000.0, 6).as("value"))
      .orderBy(col("arm"), col("p"))
  }

  val qteSql: String =
    """WITH e AS (SELECT
      |    CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      |      ::BIGINT % 100) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    CAST(ROUND(value * 1000000.0, 0) AS BIGINT) AS vm,
      |    user_id
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (SELECT arm, COUNT(*) AS ng FROM e GROUP BY 1),
      |ps AS (SELECT unnest(CAST([0.25, 0.5, 0.75, 0.9] AS DOUBLE[]))
      |  AS p),
      |t AS (SELECT arm, p,
      |    GREATEST(1, CAST(CEIL(p * ng) AS BIGINT)) AS tr
      |  FROM g CROSS JOIN ps),
      |r AS (SELECT arm, vm,
      |    ROW_NUMBER() OVER (PARTITION BY arm ORDER BY vm, user_id) AS rn
      |  FROM e)
      |SELECT r.arm, t.p, ROUND(r.vm / 1000000.0, 6) AS value
      |FROM r JOIN t ON r.arm = t.arm AND r.rn = t.tr
      |ORDER BY r.arm, t.p""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ivfpq_batch" -> (qIvfPqBatch _),
    "q_ppr" -> (qPpr _),
    "q_bbit_minhash" -> (qBbitMinhash _),
    "q_brier_decomp" -> (qBrierDecomp _),
    "q_type_prefix_rollup" -> (qTypePrefixRollup _),
    "q_qte" -> (qQte _),
    "q_pq_residual" -> (qPqResidual _),
    "q_pca_power" -> (qPcaPower _),
    "q_changepoint" -> (qChangepoint _),
    "q_sax_motifs" -> (qSaxMotifs _),
    "q_max_concurrent" -> (qMaxConcurrent _),
    "q_harmonic_centrality" -> (qHarmonicCentrality _),
    "q_hll_intersect" -> (qHllIntersect _),
    "q_jsonl_roundtrip" -> (qJsonlRoundtrip _),
    "q_bloom_prejoin" -> (qBloomPrejoin _))

  val oracleSql: Map[String, String] = Map(
    "q_ivfpq_batch" -> ivfPqBatchSql,
    "q_ppr" -> pprSql,
    "q_bbit_minhash" -> bbitMinhashSql,
    "q_brier_decomp" -> brierDecompSql,
    "q_type_prefix_rollup" -> typePrefixRollupSql,
    "q_qte" -> qteSql,
    "q_pq_residual" -> pqResidualSql,
    "q_pca_power" -> pcaPowerSql,
    "q_changepoint" -> changepointSql,
    "q_sax_motifs" -> saxMotifsSql,
    "q_max_concurrent" -> maxConcurrentSql,
    "q_harmonic_centrality" -> harmonicCentralitySql,
    "q_hll_intersect" -> hllIntersectSql,
    "q_jsonl_roundtrip" -> TitanQueries.roundtripDigestSql,
    "q_bloom_prejoin" -> bloomPrejoinSql)
}
