package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Drift, Embeddings, Experiment, Layout, Linkage, Splits}

/** Round-6 operator batch: record linkage (blocked Levenshtein matching +
  * entity clustering), binary sign-quantized Hamming search, Z-order layout
  * auditing, skew-salted joins, and the two classic market-share OLAP shapes
  * (TPC-H Q8/Q14 idiom). Registered into [[SparkEntry]]; every entry has a
  * DuckDB oracle with matching column names, deterministic ORDER BY and
  * exact or 6-decimal-rounded outputs.
  */
object AtlasQueries {

  // -------------------------------------------------------------------------
  // Record linkage over the part-name "entity" table
  // -------------------------------------------------------------------------

  /** Distinct part names as linkage entities, keyed by the min part key that
    * carries the name (the deterministic surrogate id).
    */
  private def entities(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).groupBy(col("p_name").as("name"))
      .agg(min(col("p_partkey")).as("id"))

  private val entitiesSql =
    """e AS (SELECT p_name AS name, MIN(p_partkey) AS id
      |      FROM part GROUP BY p_name)""".stripMargin

  /** Fuzzy name pairs: block on last token, band on length, Levenshtein ≤ 3. */
  def qFuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    Linkage.fuzzyPairs(entities(spark, dir), "id", "name",
        maxDist = 3, lengthBand = 3)
      .orderBy(col("id_a"), col("id_b"))

  private val fuzzyPairsSql =
    s"""$entitiesSql,
      |blk AS (SELECT id, name, string_split(name, ' ')[-1] AS b,
      |        LENGTH(name) AS len FROM e),
      |pr AS (SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a,
      |        b.name AS name_b, levenshtein(a.name, b.name) AS dist
      |      FROM blk a JOIN blk b ON a.b = b.b AND a.id < b.id
      |      WHERE ABS(a.len - b.len) <= 3)""".stripMargin

  val fuzzyMatchSql: String =
    s"""WITH $fuzzyPairsSql
      |SELECT id_a, id_b, name_a, name_b, dist FROM pr
      |WHERE dist <= 3 ORDER BY id_a, id_b""".stripMargin

  /** Multi-pass (first ∪ last token) blocked fuzzy pairs — the recall-
    * insurance variant; 16 of its 96 sf0.01 pairs are invisible to
    * single-pass last-token blocking.
    */
  def qFuzzyMulti(spark: SparkSession, dir: String): DataFrame =
    Linkage.fuzzyPairsMultiBlock(entities(spark, dir), "id", "name",
        maxDist = 3, lengthBand = 3)
      .orderBy(col("id_a"), col("id_b"))

  val fuzzyMultiSql: String =
    s"""WITH $entitiesSql,
      |blk AS (SELECT id, name,
      |        UNNEST(list_distinct([string_split(name, ' ')[1],
      |                              string_split(name, ' ')[-1]])) AS b,
      |        LENGTH(name) AS len FROM e),
      |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a,
      |        b.name AS name_b
      |      FROM blk a JOIN blk b ON a.b = b.b AND a.id < b.id
      |      WHERE ABS(a.len - b.len) <= 3)
      |SELECT id_a, id_b, name_a, name_b,
      |  levenshtein(name_a, name_b) AS dist
      |FROM cand WHERE levenshtein(name_a, name_b) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** Entity clusters: connected components over the fuzzy pairs. */
  def qEntityClusters(spark: SparkSession, dir: String): DataFrame = {
    val ents = entities(spark, dir)
    graft.ext.Dedup.dupClusters(
        Linkage.fuzzyPairs(ents, "id", "name", maxDist = 3, lengthBand = 3)
          .select(col("id_a"), col("id_b")))
      .join(ents, Seq("id"))
      .select(col("id"), col("name"), col("cluster_id"))
      .orderBy(col("id"))
  }

  val entityClustersSql: String =
    s"""WITH RECURSIVE $fuzzyPairsSql,
      |fp AS (SELECT id_a, id_b FROM pr WHERE dist <= 3),
      |edges AS (SELECT id_a AS a, id_b AS b FROM fp
      |      UNION SELECT id_b, id_a FROM fp),
      |reach(id, r) AS (
      |      SELECT a, a FROM edges UNION SELECT a, b FROM edges
      |      UNION SELECT ed.a, r.r FROM edges ed JOIN reach r ON ed.b = r.id),
      |cl AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
      |SELECT cl.id, e.name, cl.cluster_id FROM cl JOIN e ON cl.id = e.id
      |ORDER BY cl.id""".stripMargin

  // -------------------------------------------------------------------------
  // Binary sign-quantized Hamming top-k over the embeddings table
  // -------------------------------------------------------------------------

  /** Hamming top-10 for the first five vectors as queries (64 dims → two
    * 32-bit words).
    */
  def qEmbedBinary(spark: SparkSession, dir: String): DataFrame =
    Embeddings.binaryTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        dims = 64, isQuery = col("vec_id") < 5, k = 10)
      .orderBy(col("query_id"), col("rnk"))

  val embedBinarySql: String =
    """WITH b AS (SELECT vec_id,
      |    CAST(SUM(CASE WHEN i < 32 AND embedding[i + 1] > 0
      |      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS w0,
      |    CAST(SUM(CASE WHEN i >= 32 AND embedding[i + 1] > 0
      |      THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS w1
      |  FROM embeddings
      |  CROSS JOIN (SELECT CAST(UNNEST(range(0, 64)) AS INT) AS i)
      |  GROUP BY 1),
      |q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1 FROM b
      |      WHERE vec_id < 5),
      |d AS (SELECT q.query_id, b.vec_id,
      |    bit_count(xor(b.w0, q.q0)) + bit_count(xor(b.w1, q.q1)) AS hamming
      |  FROM b CROSS JOIN q WHERE b.vec_id <> q.query_id),
      |r AS (SELECT query_id, vec_id, hamming,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming, vec_id)
      |      AS rnk FROM d)
      |SELECT query_id, vec_id, hamming, rnk FROM r WHERE rnk <= 10
      |ORDER BY query_id, rnk""".stripMargin

  /** Banded binary candidates + exact-cosine rerank (the sub-linear path);
    * exercises the codegen'd VecDot in the rerank projection. 8-bit
    * bands: the synthetic embeddings have near-independent dimensions, so a
    * 16-bit exact band almost never fires (p ≈ 4·2⁻¹⁶ per pair); real
    * embedding spaces are anisotropic (correlated sign patterns) and band
    * wider. Band width is the recall/cost dial, like LSH rows-per-band.
    */
  def qEmbedBinaryRerank(spark: SparkSession, dir: String): DataFrame =
    Embeddings.binaryTopKBandedRerank(Tables.embeddings(spark, dir), "vec_id",
        "embedding", dims = 64, isQuery = col("vec_id") < 5, k = 5, bandBits = 8)
      .select(col("query_id"), col("vec_id"),
        round(col("cosine"), 6).as("cosine"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))

  val embedBinaryRerankSql: String =
    """WITH b AS (SELECT vec_id,
      |    CAST(SUM(CASE WHEN i < 32 AND embedding[i + 1] > 0
      |      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS w0,
      |    CAST(SUM(CASE WHEN i >= 32 AND embedding[i + 1] > 0
      |      THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS w1
      |  FROM embeddings
      |  CROSS JOIN (SELECT CAST(UNNEST(range(0, 64)) AS INT) AS i)
      |  GROUP BY 1),
      |q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1 FROM b
      |      WHERE vec_id < 5),
      |cand AS (SELECT q.query_id, b.vec_id FROM b CROSS JOIN q
      |  WHERE b.vec_id <> q.query_id AND (
      |    (xor(b.w0, q.q0) & 255) = 0 OR
      |    ((xor(b.w0, q.q0) >> 8) & 255) = 0 OR
      |    ((xor(b.w0, q.q0) >> 16) & 255) = 0 OR
      |    ((xor(b.w0, q.q0) >> 24) & 255) = 0 OR
      |    (xor(b.w1, q.q1) & 255) = 0 OR
      |    ((xor(b.w1, q.q1) >> 8) & 255) = 0 OR
      |    ((xor(b.w1, q.q1) >> 16) & 255) = 0 OR
      |    ((xor(b.w1, q.q1) >> 24) & 255) = 0)),
      |cs AS (SELECT c.query_id, c.vec_id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE)))) AS cosine
      |  FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
      |  JOIN embeddings qe ON c.query_id = qe.vec_id),
      |r AS (SELECT query_id, vec_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id)
      |      AS rnk FROM cs)
      |SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, rnk
      |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** Per-dimension embedding profile (whitening / dead-dim diagnostics). */
  def qEmbedDimProfile(spark: SparkSession, dir: String): DataFrame =
    Embeddings.dimProfile(Tables.embeddings(spark, dir), "embedding")
      .orderBy(col("dim"))

  val embedDimProfileSql: String =
    """WITH c AS (SELECT i AS dim, embedding[i + 1] AS v,
      |    CAST(embedding[i + 1] AS DECIMAL(18,9)) AS vd
      |  FROM embeddings
      |  CROSS JOIN (SELECT CAST(UNNEST(range(0, 64)) AS INT) AS i)),
      |a AS (SELECT dim, COUNT(*) AS n, SUM(vd) AS s, SUM(vd * vd) AS sq,
      |    MIN(v) AS v_min, MAX(v) AS v_max
      |  FROM c GROUP BY 1)
      |SELECT dim, n, ROUND(CAST(s AS DOUBLE) / n, 6) AS mean,
      |  ROUND(SQRT((CAST(sq AS DOUBLE) -
      |    CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)), 6) AS std,
      |  v_min, v_max
      |FROM a ORDER BY dim""".stripMargin

  // -------------------------------------------------------------------------
  // Z-order layout audit over part (size × price-bucket)
  // -------------------------------------------------------------------------

  private val zBits = 6
  private val zCoarse = 4

  /** Morton-key locality audit: 6-bit p_size × 6-bit price bucket, grouped
    * into zvalue >> 4 "files"; each bucket's min/max rectangle shows both
    * dimensions pruning.
    */
  def qZorder(spark: SparkSession, dir: String): DataFrame =
    Layout.zorderAudit(
        Tables.part(spark, dir)
          .withColumn("pb", expr("(CAST(FLOOR(p_retailprice) AS BIGINT) - 900) div 2")),
        col("p_size"), col("pb"), bits = zBits, coarseBits = zCoarse)
      .orderBy(col("z_bucket"))

  val zorderSql: String = {
    val interleave = (0 until zBits).flatMap { b =>
      Seq(s"((((x >> $b) & 1)) << ${2 * b})", s"((((y >> $b) & 1)) << ${2 * b + 1})")
    }.mkString(" | ")
    s"""WITH d AS (SELECT CAST(p_size AS BIGINT) AS x,
      |    (CAST(FLOOR(p_retailprice) AS BIGINT) - 900) // 2 AS y FROM part),
      |z AS (SELECT x, y, ($interleave) AS z FROM d)
      |SELECT z >> $zCoarse AS z_bucket, COUNT(*) AS n,
      |  MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -------------------------------------------------------------------------
  // Skew-salted join (output-identical to the plain join, by construction)
  // -------------------------------------------------------------------------

  /** Brand revenue through [[Layout.saltedJoin]] — the oracle is the PLAIN
    * join: salting must never change the match set.
    */
  def qSaltedBrandRev(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("partkey"),
        col("l_extendedprice"), col("l_discount"))
    val small = Tables.part(spark, dir)
      .select(col("p_partkey").as("partkey"), col("p_brand"))
    Layout.saltedJoin(big, small, Seq("partkey"), saltFactor = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        // per-brand revenue passes 1e10 at sf1.0 — decimal-space round
        AnalyticsQueries.revenueDec(col("l_extendedprice"), col("l_discount"))
          .cast("decimal(38,2)").cast("double").as("revenue"))
      .orderBy(col("p_brand"))
  }

  val saltedBrandRevSql: String =
    s"""SELECT p_brand, COUNT(*) AS n_lines,
      |  CAST(ROUND(${AnalyticsQueries.revenueDecSql}, 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------------
  // Market-share OLAP (TPC-H Q8 / Q14 idiom)
  // -------------------------------------------------------------------------

  /** Q8-like national market share: per order year, the revenue share
    * supplied by nation-1 suppliers.
    *
    * Exactness: revenue is carried as integer 1e-4 currency units
    * (price-cents × (100 − discount-pct-cents)), so `total_revenue` is a
    * plain BIGINT on both engines — the round-8 driver red row was a
    * cross-environment DECIMAL(18,4)-representation divergence on the raw
    * decimal grand total, which integer units remove entirely. The share is
    * the repo's one fixed-order double formula, ROUND(nat/total, 6).
    */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(rev).as("total"),
        sum(when(col("s_nationkey") === 1, rev).otherwise(lit(0L))).as("nat"))
      .select(col("o_year"),
        col("total").as("total_revenue"),
        round(col("nat").cast("double") / col("total").cast("double"), 6)
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val marketShareSql: String =
    """WITH a AS (SELECT YEAR(o_orderdate) AS o_year,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
      |        (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS total,
      |    CAST(SUM(CASE WHEN s_nationkey = 1
      |        THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
      |             (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
      |        ELSE 0 END) AS BIGINT) AS nat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1)
      |SELECT o_year, total AS total_revenue,
      |  ROUND(CAST(nat AS DOUBLE) / CAST(total AS DOUBLE), 6) AS mkt_share
      |FROM a ORDER BY o_year""".stripMargin

  /** Q14-like promo effect: per ship month, the percent of revenue from
    * PROMO-type parts.
    */
  def qPromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dec = AnalyticsQueries.dec _
    val rev = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("o_month"))
      .agg(
        sum(rev).as("total"),
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast("decimal(18,4)"))).as("promo"))
      .select(col("o_month"),
        round(lit(100.0) * col("promo").cast("double") /
          col("total").cast("double"), 6).as("promo_pct"))
      .orderBy(col("o_month"))
  }

  val promoRevenueSql: String =
    """WITH a AS (SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS o_month,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |        (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total,
      |    SUM(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
      |             (1 - CAST(l_discount AS DECIMAL(18,4)))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1)
      |SELECT o_month,
      |  ROUND(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE), 6)
      |    AS promo_pct
      |FROM a ORDER BY o_month""".stripMargin

  // -------------------------------------------------------------------------
  // Distribution drift & feature-dependence audits (graft.ext.Drift)
  // -------------------------------------------------------------------------

  /** One-vs-rest KS drift scan of the token-count distribution per document
    * source — "which feed's length profile diverges from the blend".
    */
  def qKsDrift(spark: SparkSession, dir: String): DataFrame =
    Drift.ksOneVsRest(
        Tables.documents(spark, dir).select(col("source"),
          size(split(col("text"), " ")).as("x")),
        "source", "x")
      .withColumnRenamed("s", "source")
      .orderBy(col("source"))

  val ksDriftSql: String =
    """WITH t AS (SELECT source AS src, len(string_split(text, ' ')) AS x
      |           FROM documents),
      |c AS (SELECT src, x, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
      |r AS (SELECT DISTINCT src AS s FROM c),
      |ev AS (SELECT r.s, c.x,
      |    CAST(SUM(CASE WHEN c.src = r.s THEN c.cnt ELSE 0 END) AS BIGINT)
      |      AS in_cnt,
      |    CAST(SUM(CASE WHEN c.src <> r.s THEN c.cnt ELSE 0 END) AS BIGINT)
      |      AS out_cnt
      |  FROM c CROSS JOIN r GROUP BY 1, 2),
      |tot AS (SELECT src AS s, CAST(SUM(cnt) AS BIGINT) AS n_grp
      |        FROM c GROUP BY 1),
      |g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tot FROM c),
      |cum AS (SELECT s, x,
      |    SUM(in_cnt) OVER (PARTITION BY s ORDER BY x) AS cin,
      |    SUM(out_cnt) OVER (PARTITION BY s ORDER BY x) AS cout
      |  FROM ev)
      |SELECT cum.s AS source, MAX(n_grp) AS n,
      |  ROUND(MAX(ABS(CAST(cin AS DOUBLE) / CAST(n_grp AS DOUBLE) -
      |      CAST(cout AS DOUBLE) / CAST(n_tot - n_grp AS DOUBLE))), 6) AS ks
      |FROM cum JOIN tot USING (s) CROSS JOIN g
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** One-vs-rest Wasserstein-1 drift of token counts per source — the
    * magnitude-aware companion to q_ks_drift (how FAR the lengths moved, in
    * tokens, not just the sup CDF gap).
    */
  def qW1Drift(spark: SparkSession, dir: String): DataFrame =
    Drift.wasserstein1OneVsRest(
        Tables.documents(spark, dir).select(col("source"),
          size(split(col("text"), " ")).as("x")),
        "source", "x")
      .withColumnRenamed("s", "source")
      .orderBy(col("source"))

  val w1DriftSql: String =
    """WITH t AS (SELECT source AS src, len(string_split(text, ' ')) AS x
      |           FROM documents),
      |c AS (SELECT src, x, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
      |r AS (SELECT DISTINCT src AS s FROM c),
      |ev AS (SELECT r.s, c.x,
      |    CAST(SUM(CASE WHEN c.src = r.s THEN c.cnt ELSE 0 END) AS BIGINT)
      |      AS in_cnt,
      |    CAST(SUM(CASE WHEN c.src <> r.s THEN c.cnt ELSE 0 END) AS BIGINT)
      |      AS out_cnt
      |  FROM c CROSS JOIN r GROUP BY 1, 2),
      |tot AS (SELECT src AS s, CAST(SUM(cnt) AS BIGINT) AS n_grp
      |        FROM c GROUP BY 1),
      |g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tot FROM c),
      |cum AS (SELECT s, x,
      |    SUM(in_cnt) OVER (PARTITION BY s ORDER BY x) AS cin,
      |    SUM(out_cnt) OVER (PARTITION BY s ORDER BY x) AS cout,
      |    CAST(LEAD(x) OVER (PARTITION BY s ORDER BY x) - x AS DOUBLE) AS dx
      |  FROM ev)
      |SELECT cum.s AS source, MAX(n_grp) AS n,
      |  ROUND(CAST(SUM(CAST(
      |      ABS(CAST(cin AS DOUBLE) / CAST(n_grp AS DOUBLE) -
      |          CAST(cout AS DOUBLE) / CAST(n_tot - n_grp AS DOUBLE)) * dx
      |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS w1
      |FROM cum JOIN tot USING (s) CROSS JOIN g
      |WHERE dx IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** PSI of the price distribution between the pre-1998 reference period and
    * the rest — the standard go/no-go drift gate, with the per-bin
    * decomposition.
    */
  def qPsiPrice(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val split = col("l_shipdate") < lit("1998-01-01").cast("timestamp")
    Drift.psi(li.filter(split), li.filter(!split), "l_extendedprice", nBins = 10)
      .orderBy(col("bin"))
  }

  val psiPriceSql: String =
    """WITH st AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      |            FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'),
      |b AS (SELECT CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
      |        THEN 'ref' ELSE 'cur' END AS slice,
      |    CAST(LEAST(GREATEST(
      |        FLOOR((l_extendedprice - mn) * 10 / (mx - mn)), 0), 9) AS INT)
      |      AS bin
      |  FROM lineitem CROSS JOIN st),
      |c AS (SELECT slice, bin, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM b GROUP BY 1, 2),
      |spine AS (SELECT CAST(range AS INT) AS bin FROM range(0, 10)),
      |wide AS (SELECT spine.bin,
      |    COALESCE(rf.cnt, 0) AS ref_cnt, COALESCE(cu.cnt, 0) AS cur_cnt
      |  FROM spine
      |  LEFT JOIN (SELECT bin, cnt FROM c WHERE slice = 'ref') rf USING (bin)
      |  LEFT JOIN (SELECT bin, cnt FROM c WHERE slice = 'cur') cu USING (bin)),
      |t AS (SELECT bin, ref_cnt, cur_cnt,
      |    ((CAST(ref_cnt AS DOUBLE) + 0.5) /
      |       (CAST(SUM(ref_cnt) OVER () AS DOUBLE) + 5.0) -
      |     (CAST(cur_cnt AS DOUBLE) + 0.5) /
      |       (CAST(SUM(cur_cnt) OVER () AS DOUBLE) + 5.0)) *
      |    LN(((CAST(ref_cnt AS DOUBLE) + 0.5) /
      |          (CAST(SUM(ref_cnt) OVER () AS DOUBLE) + 5.0)) /
      |        ((CAST(cur_cnt AS DOUBLE) + 0.5) /
      |          (CAST(SUM(cur_cnt) OVER () AS DOUBLE) + 5.0))) AS psi_term_raw
      |  FROM wide)
      |SELECT bin, ref_cnt, cur_cnt,
      |  ROUND(psi_term_raw, 6) AS psi_term,
      |  ROUND(CAST(SUM(CAST(psi_term_raw AS DECIMAL(28,12))) OVER ()
      |    AS DOUBLE), 6) AS psi_total
      |FROM t ORDER BY bin""".stripMargin

  /** Categorical dependence audit over two warehouse column pairs: mutual
    * information, chi-square and Cramér's V from the contingency tables.
    */
  def qMutualInfo(spark: SparkSession, dir: String): DataFrame =
    Drift.categoricalDependence(Tables.orders(spark, dir),
        "o_orderpriority", "o_orderstatus", "orders_priority_x_status")
      .unionAll(Drift.categoricalDependence(Tables.customer(spark, dir),
        "c_mktsegment", "c_nationkey", "customer_segment_x_nation"))
      .orderBy(col("pair"))

  private val dependenceSqlTemplate: String =
    """SELECT '%LABEL%' AS pair, n, r_levels, c_levels,
      |  ROUND(CAST(SUM(CAST((CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      LN(CAST(cnt AS DOUBLE) * CAST(n AS DOUBLE) /
      |         (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))
      |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS mi_nats,
      |  ROUND(CAST(SUM(CAST(
      |      CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE) * CAST(n AS DOUBLE) /
      |      (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))
      |    AS DECIMAL(28,12))) AS DOUBLE) - CAST(n AS DOUBLE), 6) AS chi2,
      |  ROUND(SQRT((CAST(SUM(CAST(
      |      CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE) * CAST(n AS DOUBLE) /
      |      (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))
      |    AS DECIMAL(28,12))) AS DOUBLE) - CAST(n AS DOUBLE)) /
      |    (CAST(n AS DOUBLE) *
      |      CAST(LEAST(r_levels - 1, c_levels - 1) AS DOUBLE))), 6)
      |    AS cramers_v
      |FROM (
      |  SELECT cells.cnt, ra.ra, cb.cb, g.n, g.r_levels, g.c_levels
      |  FROM (SELECT %A% AS a, %B% AS b, CAST(COUNT(*) AS BIGINT) AS cnt
      |        FROM %TBL% GROUP BY 1, 2) cells
      |  JOIN (SELECT %A% AS a, CAST(COUNT(*) AS BIGINT) AS ra
      |        FROM %TBL% GROUP BY 1) ra USING (a)
      |  JOIN (SELECT %B% AS b, CAST(COUNT(*) AS BIGINT) AS cb
      |        FROM %TBL% GROUP BY 1) cb USING (b)
      |  CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |      CAST(COUNT(DISTINCT %A%) AS BIGINT) AS r_levels,
      |      CAST(COUNT(DISTINCT %B%) AS BIGINT) AS c_levels FROM %TBL%) g)
      |GROUP BY n, r_levels, c_levels""".stripMargin

  private def dependenceSql(tbl: String, a: String, b: String,
      label: String): String =
    dependenceSqlTemplate.replace("%TBL%", tbl).replace("%A%", a)
      .replace("%B%", b).replace("%LABEL%", label)

  val mutualInfoSql: String =
    s"""SELECT * FROM (
      |${dependenceSql("orders", "o_orderpriority", "o_orderstatus",
        "orders_priority_x_status")}
      |UNION ALL
      |${dependenceSql("customer", "c_mktsegment", "c_nationkey",
        "customer_segment_x_nation")}
      |) ORDER BY pair""".stripMargin

  /** Per-brand OLS of quantity on discount — the grouped price-elasticity
    * regression (does discounting move volume, and for which brand).
    */
  def qBrandElasticity(spark: SparkSession, dir: String): DataFrame =
    Drift.groupedOls(
        Tables.lineitem(spark, dir)
          .join(Tables.part(spark, dir),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"), col("l_discount"),
            col("l_quantity")),
        "brand", "l_discount", "l_quantity")
      .orderBy(col("brand"))

  val brandElasticitySql: String =
    """WITH m AS (SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(l_discount AS DECIMAL(18,4))) AS sx,
      |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sy,
      |    SUM(CAST(l_discount AS DECIMAL(18,4)) *
      |        CAST(l_quantity AS DECIMAL(18,4))) AS sxy,
      |    SUM(CAST(l_discount AS DECIMAL(18,4)) *
      |        CAST(l_discount AS DECIMAL(18,4))) AS sxx
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1),
      |s AS (SELECT brand, n,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS slope_raw,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      |  FROM m)
      |SELECT brand, n, ROUND(slope_raw, 6) AS slope,
      |  ROUND((syd - slope_raw * sxd) / CAST(n AS DOUBLE), 6) AS intercept
      |FROM s ORDER BY brand""".stripMargin

  /** CUPED variance-reduced A/B readout over the events stream: arms from
    * the deterministic md5 user split (the q_ab_test assignment), covariate
    * x = pre-period purchase spend, metric y = experiment-period spend.
    */
  def qCuped(spark: SparkSession, dir: String): DataFrame = {
    val splitTs = lit("2024-01-16").cast("timestamp")
    val dec0 = lit(0).cast("decimal(18,4)")
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" && col("ts") < splitTs,
          col("value").cast("decimal(18,4)")).otherwise(dec0)).as("x"),
        sum(when(col("event_type") === "purchase" && col("ts") >= splitTs,
          col("value").cast("decimal(18,4)")).otherwise(dec0)).as("y"))
      .withColumn("arm", when(Splits.hashBucket(col("user_id")) % 2 === 0,
        lit("A")).otherwise(lit("B")))
    Experiment.cuped(u, "arm", "x", "y").orderBy(col("arm"))
  }

  val cupedSql: String =
    """WITH u AS (SELECT user_id,
      |    SUM(CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
      |        THEN CAST(value AS DECIMAL(18,4))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS x,
      |    SUM(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'
      |        THEN CAST(value AS DECIMAL(18,4))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS y,
      |    CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      |        % 100) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      |  FROM events GROUP BY user_id),
      |m AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(18,4))) AS sx,
      |    SUM(CAST(y AS DECIMAL(18,4))) AS sy,
      |    SUM(CAST(x AS DECIMAL(18,4)) * CAST(y AS DECIMAL(18,4))) AS sxy,
      |    SUM(CAST(x AS DECIMAL(18,4)) * CAST(x AS DECIMAL(18,4))) AS sxx,
      |    SUM(CAST(y AS DECIMAL(18,4)) * CAST(y AS DECIMAL(18,4))) AS syy
      |  FROM u GROUP BY 1),
      |g AS (SELECT CAST(SUM(n) AS DOUBLE) AS gn, CAST(SUM(sx) AS DOUBLE) AS gsx,
      |    CAST(SUM(sy) AS DOUBLE) AS gsy, CAST(SUM(sxy) AS DOUBLE) AS gsxy,
      |    CAST(SUM(sxx) AS DOUBLE) AS gsxx, CAST(SUM(syy) AS DOUBLE) AS gsyy
      |  FROM m),
      |s AS (SELECT gn, gsx, gsy,
      |    gn * gsxy - gsx * gsy AS covn,
      |    gn * gsxx - gsx * gsx AS varxn,
      |    gn * gsyy - gsy * gsy AS varyn
      |  FROM g)
      |SELECT arm, n,
      |  ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_y,
      |  ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
      |    (covn / NULLIF(varxn, 0.0)) *
      |    (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - gsx / gn), 6)
      |    AS mean_y_adj,
      |  ROUND(covn / NULLIF(varxn, 0.0), 6) AS theta,
      |  ROUND(covn * covn / NULLIF(varxn * varyn, 0.0), 6) AS var_reduction
      |FROM m CROSS JOIN s ORDER BY arm""".stripMargin

  /** Sample-ratio-mismatch gate for the md5 user split (the q_ab_test /
    * q_cuped assignment): arm counts vs equal expected shares.
    */
  def qSrm(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(spark, dir).select(col("user_id")).distinct()
      .withColumn("arm", when(Splits.hashBucket(col("user_id")) % 2 === 0,
        lit("A")).otherwise(lit("B")))
    Experiment.srm(u, "arm").orderBy(col("arm"))
  }

  val srmSql: String =
    """WITH u AS (SELECT DISTINCT user_id,
      |    CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      |        % 100) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      |  FROM events),
      |b AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY 1),
      |g AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot, CAST(COUNT(*) AS BIGINT) AS k
      |      FROM b)
      |SELECT arm, n,
      |  ROUND(CAST(n_tot AS DOUBLE) / CAST(k AS DOUBLE), 6) AS expected,
      |  ROUND(CAST(SUM(CAST(
      |      (CAST(n AS DOUBLE) - CAST(n_tot AS DOUBLE) / CAST(k AS DOUBLE)) *
      |      (CAST(n AS DOUBLE) - CAST(n_tot AS DOUBLE) / CAST(k AS DOUBLE)) /
      |      (CAST(n_tot AS DOUBLE) / CAST(k AS DOUBLE))
      |    AS DECIMAL(28,12))) OVER () AS DOUBLE), 6) AS chi2,
      |  k - 1 AS dof
      |FROM b CROSS JOIN g ORDER BY arm""".stripMargin

  /** One-vs-rest Mann–Whitney location test of token counts per document
    * source — the rank-based companion to q_ks_drift from the same counts.
    */
  def qMwuDrift(spark: SparkSession, dir: String): DataFrame =
    Drift.mannWhitneyOneVsRest(
        Tables.documents(spark, dir).select(col("source"),
          size(split(col("text"), " ")).as("x")),
        "source", "x")
      .withColumnRenamed("src", "source")
      .orderBy(col("source"))

  val mwuDriftSql: String =
    """WITH t AS (SELECT source AS src, len(string_split(text, ' ')) AS x
      |           FROM documents),
      |c AS (SELECT src, x, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2),
      |p AS (SELECT x, CAST(SUM(cnt) AS BIGINT) AS tc FROM c GROUP BY 1),
      |r AS (SELECT x, tc, SUM(tc) OVER (ORDER BY x) * 2 - tc + 1 AS a2 FROM p),
      |ti AS (SELECT CAST(SUM(tc) AS BIGINT) AS n_tot,
      |    SUM(CAST(tc * tc * tc - tc AS DECIMAL(38,0))) AS tie_sum FROM p),
      |pg AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS n,
      |    SUM(CAST(cnt AS DECIMAL(19,0)) * CAST(a2 AS DECIMAL(19,0))) AS r2
      |  FROM c JOIN r USING (x) GROUP BY 1)
      |SELECT src AS source, n,
      |  ROUND((CAST(r2 AS DOUBLE) -
      |    CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) / 2.0, 6) AS u,
      |  ROUND(((CAST(r2 AS DOUBLE) -
      |      CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) / 2.0 -
      |    CAST(n AS DOUBLE) * CAST(n_tot - n AS DOUBLE) / 2.0) /
      |    SQRT(CASE WHEN CAST(n AS DOUBLE) * CAST(n_tot - n AS DOUBLE) / 12.0 *
      |        ((CAST(n_tot AS DOUBLE) + 1.0) - CAST(tie_sum AS DOUBLE) /
      |         (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) - 1.0))) <= 0.0
      |      THEN NULL
      |      ELSE CAST(n AS DOUBLE) * CAST(n_tot - n AS DOUBLE) / 12.0 *
      |        ((CAST(n_tot AS DOUBLE) + 1.0) - CAST(tie_sum AS DOUBLE) /
      |         (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) - 1.0)))
      |    END), 6) AS z
      |FROM pg CROSS JOIN ti ORDER BY source""".stripMargin

  // -------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_match" -> (qFuzzyMatch _),
    "q_fuzzy_multi" -> (qFuzzyMulti _),
    "q_entity_clusters" -> (qEntityClusters _),
    "q_embed_binary" -> (qEmbedBinary _),
    "q_embed_binary_rerank" -> (qEmbedBinaryRerank _),
    "q_embed_dim_profile" -> (qEmbedDimProfile _),
    "q_zorder" -> (qZorder _),
    "q_salted_brand_rev" -> (qSaltedBrandRev _),
    "q_market_share" -> (qMarketShare _),
    "q_promo_revenue" -> (qPromoRevenue _),
    "q_ks_drift" -> (qKsDrift _),
    "q_psi_price" -> (qPsiPrice _),
    "q_mutual_info" -> (qMutualInfo _),
    "q_brand_elasticity" -> (qBrandElasticity _),
    "q_cuped" -> (qCuped _),
    "q_srm" -> (qSrm _),
    "q_mwu_drift" -> (qMwuDrift _),
    "q_w1_drift" -> (qW1Drift _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_fuzzy_match" -> fuzzyMatchSql,
    "q_fuzzy_multi" -> fuzzyMultiSql,
    "q_entity_clusters" -> entityClustersSql,
    "q_embed_binary" -> embedBinarySql,
    "q_embed_binary_rerank" -> embedBinaryRerankSql,
    "q_embed_dim_profile" -> embedDimProfileSql,
    "q_zorder" -> zorderSql,
    "q_salted_brand_rev" -> saltedBrandRevSql,
    "q_market_share" -> marketShareSql,
    "q_promo_revenue" -> promoRevenueSql,
    "q_ks_drift" -> ksDriftSql,
    "q_psi_price" -> psiPriceSql,
    "q_mutual_info" -> mutualInfoSql,
    "q_brand_elasticity" -> brandElasticitySql,
    "q_cuped" -> cupedSql,
    "q_srm" -> srmSql,
    "q_mwu_drift" -> mwuDriftSql,
    "q_w1_drift" -> w1DriftSql
  )
}
