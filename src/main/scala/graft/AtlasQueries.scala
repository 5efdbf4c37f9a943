package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Embeddings, Layout, Linkage}

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
    * exercises the codegen'd FloatVecDot in the rerank projection. 8-bit
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
        round(AnalyticsQueries.revenueDec(col("l_extendedprice"), col("l_discount"))
          .cast("double"), 6).as("revenue"))
      .orderBy(col("p_brand"))
  }

  val saltedBrandRevSql: String =
    s"""SELECT p_brand, COUNT(*) AS n_lines,
      |  ROUND(CAST(${AnalyticsQueries.revenueDecSql} AS DOUBLE), 6) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------------
  // Market-share OLAP (TPC-H Q8 / Q14 idiom)
  // -------------------------------------------------------------------------

  /** Q8-like national market share: per order year, the revenue share
    * supplied by nation-1 suppliers.
    */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val dec = AnalyticsQueries.dec _
    val rev = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(rev).as("total"),
        sum(when(col("s_nationkey") === 1, rev)
          .otherwise(lit(0).cast("decimal(18,4)"))).as("nat"))
      .select(col("o_year"),
        round(col("total").cast("double"), 6).as("total_revenue"),
        round(col("nat").cast("double") / col("total").cast("double"), 6)
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val marketShareSql: String =
    """WITH a AS (SELECT YEAR(o_orderdate) AS o_year,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |        (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total,
      |    SUM(CASE WHEN s_nationkey = 1
      |        THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
      |             (1 - CAST(l_discount AS DECIMAL(18,4)))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS nat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1)
      |SELECT o_year, ROUND(CAST(total AS DOUBLE), 6) AS total_revenue,
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
    "q_promo_revenue" -> (qPromoRevenue _)
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
    "q_promo_revenue" -> promoRevenueSql
  )
}
