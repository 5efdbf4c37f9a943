package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Bootstrap, Compaction, Embeddings, EventStats, LinkPrediction, Mixing, TextQuality}

/** Round-5 closer batch: EWMA volume smoothing, neighborhood link prediction,
  * changelog compaction (the lakehouse upsert primitive), training-mixture
  * temperature weights, embedding-space pair-cosine health histogram, and the
  * feature-hashed linear document scorer. Registered into [[SparkEntry]]
  * alongside the other query objects; every entry has a DuckDB oracle with
  * matching column names, 6-decimal rounding and a deterministic ORDER BY.
  */
object FrontierQueries {

  /** EWMA(decay 0.9, trailing 28 days) of daily event volumes per type. */
  def qEwmaDaily(spark: SparkSession, dir: String): DataFrame =
    EventStats.ewmaDaily(Tables.events(spark, dir), "ts", "event_type")
      .orderBy(col("event_type"), col("day"))

  val ewmaDailySql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT t.event_type, t.day, t.n AS n_events,
      |  ROUND(CAST(SUM(CAST(s.n * POWER(0.9, date_diff('day', s.day, t.day))
      |      AS DECIMAL(27,12))) AS DOUBLE)
      |    / CAST(SUM(CAST(POWER(0.9, date_diff('day', s.day, t.day))
      |      AS DECIMAL(27,12))) AS DOUBLE), 6) AS ewma
      |FROM d t JOIN d s ON t.event_type = s.event_type
      |  AND date_diff('day', s.day, t.day) BETWEEN 0 AND 27
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2""".stripMargin

  /** Top-50 predicted links (Adamic-Adar) on the repeat-co-purchase graph. */
  def qLinkPred(spark: SparkSession, dir: String): DataFrame =
    LinkPrediction.neighborScores(
        InsightQueries.repeatEdges(spark, dir), "src", "dst")
      .orderBy(col("adamic_adar").desc, col("node_a"), col("node_b"))
      .limit(50)

  val linkPredSql: String =
    s"""WITH ${InsightQueries.repeatEdgesSql},
      |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT u AS mid, COUNT(*) AS deg FROM adj GROUP BY 1),
      |wdg AS (SELECT x.v AS node_a, y.v AS node_b, x.u AS mid
      |  FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v),
      |sc AS (SELECT node_a, node_b, COUNT(*) AS n_common,
      |    SUM(CAST(1.0 / LN(deg) AS DECIMAL(27,12))) AS aa,
      |    SUM(CAST(1.0 / deg AS DECIMAL(27,12))) AS ra
      |  FROM wdg JOIN deg USING (mid) GROUP BY 1, 2),
      |f AS (SELECT sc.* FROM sc WHERE NOT EXISTS
      |  (SELECT 1 FROM adj WHERE adj.u = sc.node_a AND adj.v = sc.node_b))
      |SELECT node_a, node_b, n_common,
      |  ROUND(CAST(aa AS DOUBLE), 6) AS adamic_adar,
      |  ROUND(CAST(ra AS DOUBLE), 6) AS resource_alloc
      |FROM f ORDER BY adamic_adar DESC, node_a, node_b LIMIT 50""".stripMargin

  /** Changelog compaction of the event stream to current per-user state;
    * users whose LATEST event is an error are tombstoned out.
    */
  def qUpsertCompact(spark: SparkSession, dir: String): DataFrame =
    Compaction.compactLatest(Tables.events(spark, dir),
        Seq("user_id"), Seq("ts", "event_id"),
        tombstone = col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"),
        round(col("value"), 6).as("value"), col("n_versions"))
      .orderBy(col("user_id"))

  val upsertCompactSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
      |    value FROM events),
      |r AS (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts_us DESC, event_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_versions FROM e)
      |SELECT user_id, ts_us, event_id, event_type,
      |  ROUND(value, 6) AS value, n_versions
      |FROM r WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** Temperature-scaled (α=0.7) training-mixture weights per document source. */
  def qMixWeights(spark: SparkSession, dir: String): DataFrame =
    Mixing.temperatureWeights(Tables.documents(spark, dir), "source", "n_chars")
      .orderBy(col("source"))

  val mixWeightsSql: String =
    """WITH s AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS n_units FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_units) AS BIGINT) AS t_units FROM s),
      |ws AS (SELECT s.*, t.t_units,
      |    CAST(n_units AS DOUBLE) / t_units AS share,
      |    POWER(CAST(n_units AS DOUBLE) / t_units, 0.7) AS pa
      |  FROM s CROSS JOIN t),
      |z AS (SELECT CAST(SUM(CAST(pa AS DECIMAL(27,12))) AS DOUBLE) AS z FROM ws)
      |SELECT source, n_docs, n_units, ROUND(share, 6) AS share,
      |  ROUND(pa / z.z, 6) AS weight,
      |  ROUND(pa / z.z * t_units / n_units, 6) AS epochs
      |FROM ws CROSS JOIN z ORDER BY source""".stripMargin

  /** Cosine histogram over deterministic md5-paired embedding rows. */
  def qEmbedSimHist(spark: SparkSession, dir: String): DataFrame =
    Embeddings.pairCosineHistogram(Tables.embeddings(spark, dir),
        "vec_id", "embedding")
      .orderBy(col("bin"))

  val embedSimHistSql: String =
    """WITH h AS (SELECT vec_id AS id, embedding AS vec,
      |    md5(CAST(vec_id AS VARCHAR)) AS hh,
      |    ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 64
      |      AS bucket
      |  FROM embeddings),
      |p AS (SELECT *, ROW_NUMBER() OVER w AS rn, LEAD(vec) OVER w AS pvec
      |  FROM h WINDOW w AS (PARTITION BY bucket ORDER BY hh, id)),
      |c AS (SELECT ROUND(
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> vec[i]::DOUBLE * pvec[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> vec[i]::DOUBLE * vec[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> pvec[i]::DOUBLE * pvec[i]::DOUBLE)))), 6) AS cos
      |  FROM p WHERE rn % 2 = 1 AND pvec IS NOT NULL),
      |b AS (SELECT CAST(LEAST(19, GREATEST(0,
      |    FLOOR((cos + 1.0) / 2.0 * 20))) AS INT) AS bin, cos FROM c)
      |SELECT bin, ROUND(-1.0 + bin * 2.0 / 20, 6) AS lo, COUNT(*) AS n_pairs,
      |  ROUND(CAST(SUM(CAST(cos AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6)
      |    AS mean_cos
      |FROM b GROUP BY 1 ORDER BY bin""".stripMargin

  /** Feature-hashed linear quality score (fastText shape) per document. */
  def qQualityLr(spark: SparkSession, dir: String): DataFrame =
    TextQuality.hashedLinearScore(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val qualityLrSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |  FROM documents),
      |f AS (SELECT doc_id, unnest(toks) AS feat FROM t
      |      UNION ALL
      |      SELECT doc_id, unnest(list_transform(
      |          generate_series(1, len(toks) - 1),
      |          i -> toks[i] || '_' || toks[i + 1])) AS feat
      |        FROM t WHERE len(toks) >= 2),
      |w AS (SELECT doc_id,
      |    CAST((('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096) % 997
      |      AS DOUBLE) / 996.0 - 0.5 AS w
      |  FROM f),
      |a AS (SELECT doc_id, COUNT(*) AS n_feats,
      |    CAST(SUM(CAST(w AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS raw
      |  FROM w GROUP BY 1)
      |SELECT doc_id, n_feats, ROUND(raw, 6) AS raw,
      |  ROUND(1.0 / (1.0 + EXP(-raw)), 6) AS score
      |FROM a ORDER BY doc_id""".stripMargin

  /** Poisson-bootstrap 95% CI for mean order value per order priority. */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame =
    Bootstrap.groupMeanCi(
        Tables.orders(spark, dir)
          .select(col("o_orderpriority").as("priority"),
            col("o_totalprice"), col("o_orderkey")),
        Seq("priority"), "o_totalprice", "o_orderkey")
      .orderBy(col("priority"))

  val bootstrapCiSql: String =
    """WITH b AS (SELECT o_orderpriority AS priority, o_orderkey AS rid,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS v FROM orders),
      |r AS (SELECT priority, rid, v, rep FROM b CROSS JOIN
      |    (SELECT unnest(generate_series(0, 49)) AS rep)),
      |u0 AS (SELECT priority, rep, v,
      |    ('0x' || substr(md5(rid || ':' || rep), 1, 13))::BIGINT
      |      / 4503599627370496.0 AS u FROM r),
      |w AS (SELECT priority, rep, v,
      |    CASE WHEN u < 0.36787944117144233 THEN 0
      |         WHEN u < 0.7357588823428847 THEN 1
      |         WHEN u < 0.9196986029286059 THEN 2
      |         WHEN u < 0.9810118431238463 THEN 3
      |         WHEN u < 0.9963401531726564 THEN 4
      |         WHEN u < 0.9994058151824184 THEN 5
      |         ELSE 6 END AS w
      |  FROM u0),
      |rm AS (SELECT priority, rep,
      |    CAST(SUM(v * w) AS DOUBLE) / SUM(w) AS rm FROM w GROUP BY 1, 2),
      |a AS (SELECT priority, COUNT(*) AS n,
      |    CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean FROM b GROUP BY 1),
      |c AS (SELECT priority, quantile_cont(rm, 0.025) AS ci_lo,
      |    quantile_cont(rm, 0.975) AS ci_hi FROM rm GROUP BY 1)
      |SELECT a.priority, a.n, ROUND(a.mean, 6) AS mean,
      |  ROUND(c.ci_lo, 6) AS ci_lo, ROUND(c.ci_hi, 6) AS ci_hi
      |FROM a JOIN c USING (priority) ORDER BY priority""".stripMargin

  /** Calibration curve of the hashed linear scorer against the Gopher keep
    * label: fixed score bins (no global NTILE — a pure scan + aggregate at
    * any scale), per-bin empirical keep rate.
    */
  def qScoreCalibration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val s = TextQuality.hashedLinearScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("score"))
    val g = TextQuality.gopherSignals(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep"))
    s.join(g, "doc_id")
      .select(least(lit(19), floor(col("score") * 20)).cast("int").as("bin"),
        col("score"), col("keep"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("score").cast("decimal(27,12)")).cast("double") /
          count(lit(1)), 6).as("mean_score"),
        round(sum(when(col("keep"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("keep_rate"))
      .withColumn("lo", round(col("bin") / lit(20.0), 6))
      .select(col("bin"), col("lo"), col("n_docs"), col("mean_score"),
        col("keep_rate"))
      .orderBy(col("bin"))
  }

  /** Shared oracle CTE chain for the hashed-score queries, ending in
    * `sc(doc_id, score)` (ROUND 6) and `g(doc_id, keep)`.
    */
  private[graft] val calibScoreKeepCtes: String =
    """t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |  FROM documents),
      |f AS (SELECT doc_id, unnest(toks) AS feat FROM t
      |      UNION ALL
      |      SELECT doc_id, unnest(list_transform(
      |          generate_series(1, len(toks) - 1),
      |          i -> toks[i] || '_' || toks[i + 1])) AS feat
      |        FROM t WHERE len(toks) >= 2),
      |wf AS (SELECT doc_id,
      |    CAST((('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096) % 997
      |      AS DOUBLE) / 996.0 - 0.5 AS w
      |  FROM f),
      |sc AS (SELECT doc_id, ROUND(1.0 / (1.0 + EXP(
      |    -(CAST(SUM(CAST(w AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*)))), 6)
      |    AS score
      |  FROM wf GROUP BY 1),
      |tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
      |  FROM documents),
      |tc AS (SELECT doc_id, tk, COUNT(*) AS c FROM tf GROUP BY 1, 2),
      |ta AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    MAX(c) AS max_tf FROM tc GROUP BY 1),
      |bg AS (SELECT doc_id, unnest(list_transform(
      |    generate_series(1, greatest(len(l) - 1, 1)),
      |    i -> array_to_string(l[i:i+1], ' '))) AS b
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
      |ba AS (SELECT doc_id, COUNT(*) AS n_bg, COUNT(DISTINCT b) AS n_distinct_bg
      |    FROM bg GROUP BY 1),
      |g AS (SELECT ta.doc_id,
      |    (CAST(max_tf AS DOUBLE) / n_tokens <= 0.20 AND
      |     1.0 - CAST(n_distinct_bg AS DOUBLE) / n_bg <= 0.30) AS keep
      |  FROM ta JOIN ba USING (doc_id))""".stripMargin

  val scoreCalibrationSql: String =
    s"""WITH $calibScoreKeepCtes,
      |j AS (SELECT CAST(LEAST(19, FLOOR(sc.score * 20)) AS INT) AS bin,
      |    sc.score, g.keep FROM sc JOIN g USING (doc_id))
      |SELECT bin, ROUND(bin / 20.0, 6) AS lo, COUNT(*) AS n_docs,
      |  ROUND(CAST(SUM(CAST(score AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6)
      |    AS mean_score,
      |  ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS keep_rate
      |FROM j GROUP BY 1 ORDER BY bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bootstrap_ci" -> (qBootstrapCi _),
    "q_score_calibration" -> (qScoreCalibration _),
    "q_ewma_daily" -> (qEwmaDaily _),
    "q_link_pred" -> (qLinkPred _),
    "q_upsert_compact" -> (qUpsertCompact _),
    "q_mix_weights" -> (qMixWeights _),
    "q_embed_sim_hist" -> (qEmbedSimHist _),
    "q_quality_lr" -> (qQualityLr _))

  val oracleSql: Map[String, String] = Map(
    "q_bootstrap_ci" -> bootstrapCiSql,
    "q_score_calibration" -> scoreCalibrationSql,
    "q_ewma_daily" -> ewmaDailySql,
    "q_link_pred" -> linkPredSql,
    "q_upsert_compact" -> upsertCompactSql,
    "q_mix_weights" -> mixWeightsSql,
    "q_embed_sim_hist" -> embedSimHistSql,
    "q_quality_lr" -> qualityLrSql)
}
