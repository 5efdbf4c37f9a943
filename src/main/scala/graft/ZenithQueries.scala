package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Clustering, Dedup, Experiment, Privacy, SimSearch, TextQuality}

/** Round-8 batch #2: the release/selection end of the training-data pipeline —
  * seeded IVF probe search (the oracle-checkable twin of the k-means IVF
  * path), k-anonymity/l-diversity release audit, Cohen's-kappa label-agreement
  * QA, canonical-representative selection after dup clustering, the
  * perplexity-filter retention curve, and tokenizer fertility by language.
  * Registered into [[SparkEntry]]; every oracle uses matching column
  * names/types, 6-decimal rounding on floating-point outputs and a
  * deterministic ORDER BY (q_tokenizer_fertility is rows-only — BPE merge
  * training is a recurrence DuckDB can't express — and is golden-locked in
  * BpeTrainSpec instead).
  */
object ZenithQueries {

  // --------------------------------------------------------------------------
  // Seeded IVF probe search
  // --------------------------------------------------------------------------

  /** IVF top-10 for vec 0 with the vec_id<8 seed quantizer, probing the 3
    * nearest cells ([[SimSearch.seededIvfTopK]]). Recall vs the exact scan is
    * by design < 1 (SimSearchSpec asserts the trade); the oracle proves the
    * PRUNED result exactly.
    */
  def qIvfSeeded(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    SimSearch.seededIvfTopK(emb, "vec_id", "embedding", seeds, "cid", "cvec",
        queryId = 0L, k = 10, nProbe = 3)
      .select(col("vec_id"), col("centroid_id"), round(col("cosine"), 6).as("cosine"))
  }

  val ivfSeededSql: String =
    s"""WITH ${ExtQueries.centroidAssignCtes},
      |asn AS (SELECT vec_id, cid FROM r WHERE rk = 1),
      |q AS (SELECT embedding AS qe, nv AS qn FROM v WHERE vec_id = 0),
      |probe AS (SELECT c.cid FROM c CROSS JOIN q
      |  ORDER BY list_sum(list_transform(generate_series(1, 64),
      |      i -> c.ce[i]::DOUBLE * q.qe[i]::DOUBLE)) / (c.nc * q.qn) DESC, c.cid
      |  LIMIT 3),
      |cand AS (SELECT a.vec_id, a.cid FROM asn a JOIN probe p ON a.cid = p.cid
      |  WHERE a.vec_id <> 0),
      |sc AS (SELECT cand.vec_id, cand.cid AS centroid_id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> v.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) / (v.nv * q.qn) AS cos_raw
      |  FROM cand JOIN v ON cand.vec_id = v.vec_id CROSS JOIN q)
      |SELECT vec_id, centroid_id, ROUND(cos_raw, 6) AS cosine FROM sc
      |ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin

  // --------------------------------------------------------------------------
  // k-anonymity / l-diversity release audit
  // --------------------------------------------------------------------------

  /** Per-equivalence-class re-identification audit of the customer table
    * ([[Privacy.kAnonymity]]): quasi-identifiers (nation, market segment,
    * $1000 balance band), sensitive value = the exact balance; k=5, l=3.
    */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame =
    Privacy.kAnonymity(Tables.customer(spark, dir),
        Seq(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band")),
        col("c_acctbal"), k = 5, l = 3)
      .orderBy(col("nation"), col("segment"), col("bal_band"))

  val kAnonymitySql: String =
    """SELECT c_nationkey AS nation, c_mktsegment AS segment,
      |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
      |  COUNT(*) AS class_size,
      |  COUNT(DISTINCT c_acctbal) AS l_diversity,
      |  COUNT(*) < 5 AS k_at_risk,
      |  COUNT(DISTINCT c_acctbal) < 3 AS l_at_risk
      |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------------------
  // Cohen's kappa (1-NN-seed label predictions vs true labels)
  // --------------------------------------------------------------------------

  /** Chance-corrected agreement ([[Experiment.cohensKappa]]) between the
    * nearest-seed-centroid label prediction (seeds: vec_id<10 with their
    * labels) and the true label, over all non-seed vectors.
    */
  def qCohensKappa(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
        col("label").as("seed_label"))
    val assigned = Clustering.assignToCentroids(emb.filter(col("vec_id") >= 10),
      "vec_id", "embedding", seeds.select(col("cid"), col("cvec")), "cid", "cvec")
    val joined = assigned
      .join(seeds.select(col("cid").as("centroid_id"), col("seed_label")),
        "centroid_id")
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .select(col("seed_label").as("pred"), col("label").as("truth"))
    Experiment.cohensKappa(joined, "pred", "truth")
  }

  val cohensKappaSql: String =
    """WITH v AS (SELECT vec_id, embedding, label,
      |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nv
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cid, embedding AS ce, label AS slabel, nv AS nc
      |  FROM v WHERE vec_id < 10),
      |s AS (SELECT v.vec_id, c.cid, c.slabel,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> v.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) / (v.nv * c.nc) AS cos
      |  FROM v CROSS JOIN c WHERE v.vec_id >= 10),
      |r AS (SELECT vec_id, slabel,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
      |  FROM s),
      |j AS (SELECT r.slabel AS pred, v.label AS truth
      |  FROM r JOIN v USING (vec_id) WHERE rk = 1),
      |cell AS (SELECT pred, truth, COUNT(*) AS n_cell FROM j GROUP BY 1, 2),
      |n AS (SELECT CAST(SUM(n_cell) AS BIGINT) AS n FROM cell),
      |po AS (SELECT COALESCE(CAST(SUM(n_cell) AS BIGINT), 0) AS n_agree
      |  FROM cell WHERE pred = truth),
      |pm AS (SELECT pred AS cl, CAST(SUM(n_cell) AS BIGINT) AS n_pred
      |  FROM cell GROUP BY 1),
      |tm AS (SELECT truth AS cl, CAST(SUM(n_cell) AS BIGINT) AS n_truth
      |  FROM cell GROUP BY 1),
      |pe AS (SELECT COALESCE(CAST(SUM(n_pred * n_truth) AS BIGINT), 0) AS s_pe
      |  FROM pm JOIN tm USING (cl))
      |SELECT n,
      |  ROUND(CAST(n_agree AS DOUBLE) / n, 6) AS p_o,
      |  ROUND(CAST(s_pe AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS p_e,
      |  ROUND((CAST(n_agree AS DOUBLE) / n - CAST(s_pe AS DOUBLE) / (CAST(n AS DOUBLE) * n))
      |    / (1.0 - CAST(s_pe AS DOUBLE) / (CAST(n AS DOUBLE) * n)), 6) AS kappa
      |FROM n CROSS JOIN po CROSS JOIN pe""".stripMargin

  // --------------------------------------------------------------------------
  // Canonical-representative selection after dup clustering
  // --------------------------------------------------------------------------

  /** Per dup-cluster survivor pick ([[Dedup.canonicalPick]]) over the
    * Jaccard-0.5 clusters of q_dup_clusters: keep the longest member
    * (n_chars, smaller doc_id on ties).
    */
  def qClusterCanonical(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = Dedup.dupClusters(
      Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5))
    Dedup.canonicalPick(clusters, docs, "doc_id", "n_chars")
      .orderBy(col("cluster_id"))
  }

  val clusterCanonicalSql: String =
    s"""WITH RECURSIVE ${ExtQueries.shinglesSql},
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |pr AS (SELECT id_a, id_b FROM p
      |      JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
      |      WHERE n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) >= 0.5),
      |edges AS (SELECT id_a AS a, id_b AS b FROM pr
      |      UNION SELECT id_b, id_a FROM pr),
      |reach(id, r) AS (
      |      SELECT a, a FROM edges UNION SELECT a, b FROM edges
      |      UNION SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id),
      |cl AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      |g AS (SELECT cl.cluster_id, cl.id, d.n_chars
      |      FROM cl JOIN documents d ON cl.id = d.doc_id),
      |agg AS (SELECT cluster_id, COUNT(*) AS n_members FROM g GROUP BY 1),
      |pick AS (SELECT cluster_id, id AS canonical_id, n_chars AS canonical_quality,
      |      ROW_NUMBER() OVER (PARTITION BY cluster_id
      |        ORDER BY n_chars DESC, id) AS rk FROM g)
      |SELECT a.cluster_id, canonical_id, canonical_quality, n_members,
      |  n_members - 1 AS n_dropped
      |FROM agg a JOIN pick p ON a.cluster_id = p.cluster_id
      |WHERE rk = 1 AND n_members >= 2
      |ORDER BY a.cluster_id""".stripMargin

  // --------------------------------------------------------------------------
  // Perplexity-filter retention curve
  // --------------------------------------------------------------------------

  /** Decile retention table for a unigram-NLL quality cut
    * ([[TextQuality.nllRetentionCurve]]).
    */
  def qNllFilterCurve(spark: SparkSession, dir: String): DataFrame =
    TextQuality.nllRetentionCurve(Tables.documents(spark, dir), "doc_id", "text",
        buckets = 10)
      .orderBy(col("tier"))

  val nllFilterCurveSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |    FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |corpus AS (SELECT t, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM corpus),
      |nll AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
      |    ROUND(-CAST(SUM(CAST(tf * ln(cnt * 1.0 / total) AS DECIMAL(18,8)))
      |        AS DOUBLE) / CAST(SUM(tf) AS BIGINT), 6) AS avg_nll
      |  FROM tf JOIN corpus USING (t) CROSS JOIN tot GROUP BY 1),
      |r AS (SELECT doc_id, n_tokens, avg_nll,
      |    ROW_NUMBER() OVER (ORDER BY avg_nll, doc_id) AS rn FROM nll),
      |nn AS (SELECT COUNT(*) AS n FROM r),
      |d AS (SELECT ((rn - 1) * 10 // n) + 1 AS tier, n_tokens, avg_nll
      |  FROM r CROSS JOIN nn),
      |g AS (SELECT tier, COUNT(*) AS n_docs, MAX(avg_nll) AS cutoff_nll,
      |    CAST(SUM(n_tokens) AS BIGINT) AS toks FROM d GROUP BY 1),
      |t2 AS (SELECT CAST(SUM(toks) AS BIGINT) AS tt FROM g)
      |SELECT tier, n_docs, ROUND(cutoff_nll, 6) AS cutoff_nll,
      |  CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
      |  CAST(SUM(toks) OVER w AS BIGINT) AS cum_tokens,
      |  ROUND(CAST(SUM(toks) OVER w AS DOUBLE) / tt, 6) AS token_share
      |FROM g CROSS JOIN t2
      |WINDOW w AS (ORDER BY tier ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY tier""".stripMargin

  // --------------------------------------------------------------------------
  // Tokenizer fertility by language (rows-only: BPE training is a recurrence)
  // --------------------------------------------------------------------------

  /** Per-language fertility/compression of the corpus-trained 16-merge BPE
    * tokenizer ([[graft.ext.BpeTrain.fertilityByGroup]]); semantics locked by
    * BpeTrainSpec's golden fixture.
    */
  def qTokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = graft.ext.BpeTrain.train(docs, "text", nMerges = 16, minFreq = 2)
    graft.ext.BpeTrain.fertilityByGroup(docs, "doc_id", "text", "lang", merges)
      .withColumnRenamed("grp", "lang")
      .orderBy(col("lang"))
  }

  // --------------------------------------------------------------------------
  // Diagonal-Mahalanobis embedding outliers
  // --------------------------------------------------------------------------

  /** Top-20 corpus anomalies by squared diagonal-Mahalanobis distance
    * ([[graft.ext.Embeddings.mahalanobisOutliers]]).
    */
  def qEmbedOutliers(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Embeddings.mahalanobisOutliers(Tables.embeddings(spark, dir),
        "vec_id", "embedding", topN = 20)
      .select(col("vec_id"), round(col("mahal2"), 6).as("mahal2"))

  val embedOutliersSql: String =
    """WITH c AS (SELECT i AS dim, CAST(embedding[i + 1] AS DECIMAL(18,9)) AS vd
      |  FROM embeddings
      |  CROSS JOIN (SELECT CAST(UNNEST(range(0, 64)) AS INT) AS i)),
      |a AS (SELECT dim, COUNT(*) AS n, SUM(vd) AS s, SUM(vd * vd) AS sq
      |  FROM c GROUP BY 1),
      |st AS (SELECT dim, ROUND(CAST(s AS DOUBLE) / n, 6) AS mean,
      |    ROUND(SQRT((CAST(sq AS DOUBLE) -
      |      CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)), 6) AS std
      |  FROM a),
      |arr AS (SELECT list(mean ORDER BY dim) AS mu, list(std ORDER BY dim) AS sd
      |  FROM st),
      |sc AS (SELECT e.vec_id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> CASE WHEN sd[i] = 0 THEN 0.0 ELSE
      |        ((e.embedding[i]::DOUBLE - mu[i]) / sd[i]) *
      |        ((e.embedding[i]::DOUBLE - mu[i]) / sd[i]) END)) AS mahal2
      |  FROM embeddings e CROSS JOIN arr)
      |SELECT vec_id, ROUND(mahal2, 6) AS mahal2 FROM sc
      |ORDER BY mahal2 DESC, vec_id LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // Benford first-digit audit
  // --------------------------------------------------------------------------

  /** Benford's-law chi² over order totals ([[graft.ext.Profiling.benfordAudit]]). */
  def qBenford(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profiling.benfordAudit(Tables.orders(spark, dir), "o_totalprice")
      .orderBy(col("digit"))

  val benfordSql: String =
    """WITH d AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM orders WHERE o_totalprice >= 1),
      |c AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1),
      |spine AS (SELECT CAST(UNNEST(range(1, 10)) AS INT) AS digit),
      |b AS (SELECT s.digit, CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs
      |  FROM spine s LEFT JOIN c ON s.digit = c.digit),
      |g AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_tot FROM b),
      |t AS (SELECT b.digit, b.n_obs,
      |    CAST(n_tot AS DOUBLE) *
      |      (ln(1.0::DOUBLE + 1.0::DOUBLE / CAST(b.digit AS DOUBLE)) /
      |       ln(10.0::DOUBLE)) AS expected
      |  FROM b CROSS JOIN g),
      |x AS (SELECT digit, n_obs, expected,
      |    CAST((CAST(n_obs AS DOUBLE) - expected) * (CAST(n_obs AS DOUBLE) - expected)
      |      / expected AS DECIMAL(28,12)) AS chi_term
      |  FROM t),
      |s2 AS (SELECT CAST(SUM(chi_term) AS DOUBLE) AS chi2_raw FROM x)
      |SELECT digit, n_obs, ROUND(expected, 6) AS expected,
      |  ROUND(chi2_raw, 6) AS chi2, CAST(8 AS BIGINT) AS dof
      |FROM x CROSS JOIN s2 ORDER BY digit""".stripMargin

  // --------------------------------------------------------------------------
  // Padding-waste audit (length-bucketed batching)
  // --------------------------------------------------------------------------

  /** Pad-to-power-of-two waste table over the documents corpus
    * ([[graft.ext.Packing.padWasteByBucket]]).
    */
  def qPadWaste(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Packing.padWasteByBucket(Tables.documents(spark, dir), "text")
      .orderBy(col("bucket_len"))

  val padWasteSql: String =
    """WITH n AS (SELECT len(string_split(text, ' ')) AS nt FROM documents),
      |b AS (SELECT CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
      |    WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128 WHEN nt <= 256 THEN 256
      |    WHEN nt <= 512 THEN 512 WHEN nt <= 1024 THEN 1024 ELSE -1 END
      |      AS bucket_len, nt FROM n),
      |g AS (SELECT CAST(bucket_len AS BIGINT) AS bucket_len, COUNT(*) AS n_docs,
      |    CAST(SUM(nt) AS BIGINT) AS sum_tokens FROM b GROUP BY 1),
      |p AS (SELECT bucket_len, n_docs, sum_tokens,
      |    CASE WHEN bucket_len > 0 THEN bucket_len * n_docs ELSE sum_tokens END
      |      AS padded_tokens FROM g)
      |SELECT bucket_len, n_docs, sum_tokens, padded_tokens,
      |  padded_tokens - sum_tokens AS waste_tokens,
      |  ROUND(CAST(padded_tokens - sum_tokens AS DOUBLE) / padded_tokens, 6)
      |    AS waste_share
      |FROM p ORDER BY bucket_len""".stripMargin

  // --------------------------------------------------------------------------
  // kNN label-noise screen
  // --------------------------------------------------------------------------

  /** Vectors whose label disagrees with the 5-NN anchor majority
    * ([[Clustering.labelNoiseByKnn]]; anchors: vec_id<10 with their labels).
    */
  def qLabelNoise(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Clustering.labelNoiseByKnn(emb.filter(col("vec_id") >= 10),
        "vec_id", "embedding", "label",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", "label", k = 5)
      .orderBy(col("vec_id"))
  }

  val labelNoiseSql: String =
    """WITH v AS (SELECT vec_id, embedding, label,
      |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nv
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cid, embedding AS ce, label AS slabel, nv AS nc
      |  FROM v WHERE vec_id < 10),
      |s AS (SELECT v.vec_id, v.label, c.cid, c.slabel,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> v.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) / (v.nv * c.nc) AS cos
      |  FROM v CROSS JOIN c WHERE v.vec_id >= 10),
      |r AS (SELECT vec_id, label, cid, slabel,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
      |  FROM s),
      |votes AS (SELECT vec_id, label, slabel, COUNT(*) AS n
      |  FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
      |m AS (SELECT vec_id, label, slabel, n,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY n DESC, slabel) AS vr
      |  FROM votes)
      |SELECT vec_id, label, slabel AS pred_label, CAST(n AS BIGINT) AS n_votes
      |FROM m WHERE vr = 1 AND slabel <> label ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------------------------
  // Embedding isotropy
  // --------------------------------------------------------------------------

  /** One-row isotropy panel ([[graft.ext.Embeddings.isotropyProfile]]). */
  def qEmbedIsotropy(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Embeddings.isotropyProfile(Tables.embeddings(spark, dir),
      "embedding")

  val embedIsotropySql: String =
    """WITH c AS (SELECT i AS dim, CAST(embedding[i + 1] AS DECIMAL(18,9)) AS vd
      |  FROM embeddings
      |  CROSS JOIN (SELECT CAST(UNNEST(range(0, 64)) AS INT) AS i)),
      |a AS (SELECT dim, COUNT(*) AS n, SUM(vd) AS s, SUM(vd * vd) AS sq
      |  FROM c GROUP BY 1),
      |va AS (SELECT CAST(ROUND((CAST(sq AS DOUBLE) -
      |    CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1), 6)
      |    AS DECIMAL(18,6)) AS var FROM a),
      |g AS (SELECT COUNT(*) AS n_dims, SUM(var) AS sv,
      |    SUM(CAST(var * var AS DECIMAL(38,12))) AS svv, MAX(var) AS vmax
      |  FROM va)
      |SELECT n_dims, ROUND(CAST(sv AS DOUBLE), 6) AS total_var,
      |  ROUND(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(svv AS DOUBLE), 6)
      |    AS participation_ratio,
      |  ROUND(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(svv AS DOUBLE)
      |    / n_dims, 6) AS pr_fraction,
      |  ROUND(CAST(vmax AS DOUBLE) / CAST(sv AS DOUBLE), 6) AS top1_var_share
      |FROM g""".stripMargin

  // --------------------------------------------------------------------------
  // Vocabulary diversity by source
  // --------------------------------------------------------------------------

  /** Per-source diversity panel ([[graft.ext.TextStats.vocabDiversity]]). */
  def qVocabDiversity(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextStats.vocabDiversity(Tables.documents(spark, dir),
        "source", "text")
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))

  val vocabDiversitySql: String =
    """WITH tf AS (SELECT grp, t, COUNT(*) AS c FROM (
      |    SELECT source AS grp, unnest(string_split(text, ' ')) AS t
      |    FROM documents) GROUP BY 1, 2),
      |g AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
      |    SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(18,8)))
      |      AS sclc,
      |    CAST(SUM(c * (c - 1)) AS BIGINT) AS srep
      |  FROM tf GROUP BY 1)
      |SELECT grp AS source, n_tokens, n_types,
      |  ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
      |  ROUND((ln(CAST(n_tokens AS DOUBLE)) - CAST(sclc AS DOUBLE) / n_tokens)
      |    / 0.6931471805599453, 6) AS entropy_bits,
      |  ROUND(CAST(srep AS DOUBLE) /
      |    (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6) AS simpson
      |FROM g ORDER BY source""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ivf_seeded" -> (qIvfSeeded _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_cohens_kappa" -> (qCohensKappa _),
    "q_cluster_canonical" -> (qClusterCanonical _),
    "q_nll_filter_curve" -> (qNllFilterCurve _),
    "q_tokenizer_fertility" -> (qTokenizerFertility _),
    "q_embed_outliers" -> (qEmbedOutliers _),
    "q_benford" -> (qBenford _),
    "q_pad_waste" -> (qPadWaste _),
    "q_label_noise" -> (qLabelNoise _),
    "q_embed_isotropy" -> (qEmbedIsotropy _),
    "q_vocab_diversity" -> (qVocabDiversity _))

  val oracleSql: Map[String, String] = Map(
    "q_ivf_seeded" -> ivfSeededSql,
    "q_k_anonymity" -> kAnonymitySql,
    "q_cohens_kappa" -> cohensKappaSql,
    "q_cluster_canonical" -> clusterCanonicalSql,
    "q_nll_filter_curve" -> nllFilterCurveSql,
    "q_embed_outliers" -> embedOutliersSql,
    "q_benford" -> benfordSql,
    "q_pad_waste" -> padWasteSql,
    "q_label_noise" -> labelNoiseSql,
    "q_embed_isotropy" -> embedIsotropySql,
    "q_vocab_diversity" -> vocabDiversitySql)
}
