package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext._

/** Extension queries (training-data-pipeline operators) + their DuckDB oracles.
  * Merged into [[SparkEntry.queries]] / [[SparkEntry.oracleSql]].
  *
  * SQL-generation note: the MinHash/SimHash/embedding-LSH oracles are generated
  * programmatically from the SAME constants the Scala operators use
  * ([[Dedup.minhashA]] etc.), so Spark and DuckDB run literally the same hash
  * arithmetic (md5-prefix integers — portable across both engines).
  */
object ExtQueries {

  // -------------------------------------------------------------------------
  // Dedup
  // -------------------------------------------------------------------------

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val dedupExactSql: String =
    """WITH g AS (SELECT md5(text) AS h, MIN(doc_id) AS canonical_id,
      |    COUNT(*) AS group_size FROM documents GROUP BY 1)
      |SELECT doc_id, canonical_id, group_size
      |FROM documents JOIN g ON md5(text) = g.h ORDER BY doc_id""".stripMargin

  /** Shared shingle CTE (word 3-grams, distinct per doc). */
  private[graft] val shinglesSql =
    """sh AS (SELECT DISTINCT doc_id, sh FROM (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, greatest(len(l) - 2, 1)),
      |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)))""".stripMargin

  def qDedupJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
        k = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))

  val dedupJaccardSql: String =
    s"""WITH $shinglesSql,
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  ROUND(n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared), 6) AS jaccard
      |FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
      |WHERE n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** Dup-rate vs threshold sweep ([[Dedup.thresholdCurve]]): pair and
    * flagged-doc counts at Jaccard cutoffs 0.5–0.9 from one pair computation.
    */
  def qDedupThresholdCurve(spark: SparkSession, dir: String): DataFrame =
    Dedup.thresholdCurve(Tables.documents(spark, dir), "doc_id", "text", k = 3)
      .orderBy(col("threshold"))

  val dedupThresholdCurveSql: String =
    s"""WITH $shinglesSql,
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |j AS (SELECT id_a, id_b,
      |      n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) AS jaccard
      |  FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
      |  WHERE n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) >= 0.5),
      |th AS (SELECT CAST(v AS DOUBLE) AS threshold
      |  FROM (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)) t(v)),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
      |pc AS (SELECT threshold, COUNT(*) AS n_pairs
      |  FROM j JOIN th ON j.jaccard >= th.threshold GROUP BY 1),
      |dm AS (SELECT id, MAX(jaccard) AS mj FROM (
      |    SELECT id_a AS id, jaccard FROM j
      |    UNION ALL SELECT id_b AS id, jaccard FROM j) GROUP BY 1),
      |dc AS (SELECT threshold, COUNT(*) AS n_dup_docs
      |  FROM dm JOIN th ON dm.mj >= th.threshold GROUP BY 1)
      |SELECT th.threshold, COALESCE(pc.n_pairs, 0) AS n_pairs,
      |  COALESCE(dc.n_dup_docs, 0) AS n_dup_docs,
      |  ROUND(COALESCE(dc.n_dup_docs, 0) * 1.0 / nd.n_docs, 6) AS dup_doc_rate
      |FROM th LEFT JOIN pc ON th.threshold = pc.threshold
      |LEFT JOIN dc ON th.threshold = dc.threshold
      |CROSS JOIN nd ORDER BY th.threshold""".stripMargin

  /** PPJoin-style prefix-filtered Jaccard ([[Dedup.jaccardPairsPrefix]]):
    * output-identical to [[qDedupJaccard]] (the prefix filter is lossless),
    * but candidates come only from each doc's rarest-first prefix shingles —
    * the oracle replays the whole prefix pipeline, so the rank/cut logic
    * itself is hash-verified, not just the final pairs.
    */
  def qDedupPrefix(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsPrefix(Tables.documents(spark, dir), "doc_id", "text",
        k = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))

  val dedupPrefixSql: String =
    s"""WITH $shinglesSql,
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |dfq AS (SELECT sh, COUNT(*) AS df_sh FROM sh GROUP BY 1),
      |pp AS (SELECT s.doc_id, s.sh,
      |    ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY df_sh, s.sh) AS pos,
      |    n.n_sh
      |  FROM sh s JOIN dfq USING (sh) JOIN n USING (doc_id)),
      |pref AS (SELECT doc_id, sh, pos, n_sh FROM pp
      |  WHERE pos <= n_sh - ceil(0.5 * n_sh) + 1),
      |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM pref a JOIN pref b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |  HAVING (1 + LEAST(ANY_VALUE(a.n_sh) - MIN(a.pos),
      |                    ANY_VALUE(b.n_sh) - MIN(b.pos))) * 1.5
      |    >= 0.5 * (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh)) - 1e-9),
      |v AS (SELECT id_a, id_b, COUNT(*) AS n_shared
      |  FROM cand
      |  JOIN sh sa ON sa.doc_id = cand.id_a
      |  JOIN sh sb ON sb.doc_id = cand.id_b AND sb.sh = sa.sh
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  ROUND(n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared), 6) AS jaccard
      |FROM v JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
      |WHERE n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  private val numHashes = 16
  private val rowsPerBand = 4
  private val numBands = numHashes / rowsPerBand

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
        k = 3, numHashes = numHashes, rowsPerBand = rowsPerBand, threshold = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))

  /** CTE chain ending in `banded(doc_id, band, bkey)` — shingles → minhash
    * signatures → LSH band keys over `documents`, shared by the same-set pair
    * oracles and the cross-set incremental-dedup oracle.
    */
  private[graft] val minhashSigBandCtesSql: String = {
    val mh = (0 until numHashes).map { j =>
      s"MIN((${Dedup.minhashA(j)} * h + ${Dedup.minhashB(j)}) % ${Dedup.MinhashPrime}) AS mh_$j"
    }.mkString(",\n      ")
    val bandRows = (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => s"mh_${b * rowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS bkey FROM sig"
    }.mkString("\n      UNION ALL ")
    s"""$shinglesSql,
      |hh AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh),
      |sig AS (SELECT doc_id,
      |      $mh
      |      FROM hh GROUP BY doc_id),
      |banded AS ($bandRows)""".stripMargin
  }

  /** CTE chain ending in `j(id_a, id_b, jaccard)` — the MinHash-LSH candidate +
    * exact-verify pipeline, shared by the pair oracle and the LSH-cluster oracle.
    */
  private[graft] val minhashPairCtesSql: String = {
    s"""$minhashSigBandCtesSql,
      |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |      FROM banded x JOIN banded y
      |        ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |shared AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_shared
      |      FROM cand c JOIN sh a ON a.doc_id = c.id_a
      |      JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh GROUP BY 1, 2),
      |j AS (SELECT c.id_a, c.id_b,
      |      COALESCE(s.n_shared, 0) * 1.0 / (na.n_sh + nb.n_sh - COALESCE(s.n_shared, 0)) AS jaccard
      |      FROM cand c LEFT JOIN shared s ON c.id_a = s.id_a AND c.id_b = s.id_b
      |      JOIN n na ON c.id_a = na.doc_id JOIN n nb ON c.id_b = nb.doc_id)""".stripMargin
  }

  val dedupMinhashSql: String =
    s"""WITH $minhashPairCtesSql
      |SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM j
      |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** Near-dup clusters: connected components (min-label) over the exact-jaccard
    * pair table — each clustered doc mapped to its cluster's min doc_id. The oracle
    * computes the same components with a recursive CTE (transitive min-reachability).
    */
  def qDupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(
        Dedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
          k = 3, threshold = 0.5))
      .orderBy(col("id"))

  val dupClustersSql: String =
    s"""WITH RECURSIVE $shinglesSql,
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
      |      UNION SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id)
      |SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** The flagship dedup pipeline at its 100-TB shape: connected components
    * (pointer-jumping min-label) over the MinHash-LSH candidate path — banded
    * bucket join for candidates, exact verify, then clustering — instead of the
    * raw-shingle quadratic join [[qDupClusters]] uses. At scale THIS is the
    * composition that runs ([[qDupClusters]]'s exact pair table stays as the
    * verifier); the oracle re-derives the same components with a recursive CTE
    * over the minhash-pair SQL.
    */
  def qDupClustersLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(
        Dedup.minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
          k = 3, numHashes = numHashes, rowsPerBand = rowsPerBand, threshold = 0.5))
      .orderBy(col("id"))

  val dupClustersLshSql: String =
    s"""WITH RECURSIVE $minhashPairCtesSql,
      |pr AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
      |edges AS (SELECT id_a AS a, id_b AS b FROM pr
      |      UNION SELECT id_b, id_a FROM pr),
      |reach(id, r) AS (
      |      SELECT a, a FROM edges UNION SELECT a, b FROM edges
      |      UNION SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id)
      |SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Blocking-quality audit of the MinHash-LSH banding vs the exact-Jaccard
    * ground truth ([[Dedup.blockingQuality]]): reduction ratio (share of the
    * all-pairs space never generated) + pairs completeness (share of true
    * dup pairs surfaced) — the one-row summary behind q_lsh_recall_curve's
    * per-decile resolution.
    */
  def qBlockingQuality(spark: SparkSession, dir: String): DataFrame =
    Dedup.blockingQuality(Tables.documents(spark, dir), "doc_id", "text",
      k = 3, numHashes = numHashes, rowsPerBand = rowsPerBand,
      threshold = 0.5)

  val blockingQualitySql: String =
    s"""WITH $minhashSigBandCtesSql,
      |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |      FROM banded x JOIN banded y
      |        ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |tr AS (SELECT id_a, id_b FROM p
      |      JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
      |      WHERE n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) >= 0.5),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
      |nc AS (SELECT COUNT(*) AS n_candidates FROM cand),
      |nt AS (SELECT COUNT(*) AS n_truth FROM tr),
      |cg AS (SELECT COUNT(*) AS n_caught
      |      FROM tr JOIN cand USING (id_a, id_b))
      |SELECT n_docs, n_docs * (n_docs - 1) // 2 AS n_total_pairs,
      |  n_candidates, n_truth, n_caught,
      |  ROUND(1.0 - CAST(n_candidates AS DOUBLE) /
      |    (n_docs * (n_docs - 1) // 2), 6) AS reduction_ratio,
      |  ROUND(CAST(n_caught AS DOUBLE) / n_truth, 6) AS pairs_completeness
      |FROM nd CROSS JOIN nc CROSS JOIN nt CROSS JOIN cg""".stripMargin

  /** Per-document n-gram novelty rate against everything earlier in corpus
    * order ([[graft.ext.TextStats.ngramNovelty]]): the share of each doc's
    * distinct 3-shingles first seen in that doc.
    */
  def qNgramNovelty(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextStats.ngramNovelty(Tables.documents(spark, dir), "doc_id",
        "text", k = 3)
      .orderBy(col("doc_id"))

  val ngramNoveltySql: String =
    s"""WITH $shinglesSql,
      |f AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
      |SELECT s.doc_id, COUNT(*) AS n_sh,
      |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_novel,
      |  ROUND(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
      |    AS BIGINT) * 1.0 / COUNT(*), 6) AS novelty_rate
      |FROM sh s JOIN f USING (sh) GROUP BY 1 ORDER BY 1""".stripMargin

  /** The COMPLETE near-dup curation pipeline in one plan — what a training-data
    * run actually executes end-to-end: MinHash-LSH candidate pairs → connected
    * components → keep the cluster canonical (min doc_id; singletons keep
    * themselves) → per-language stats of the surviving corpus. Composes four
    * operators ([[Dedup.minhashLshPairs]], [[Dedup.dupClusters]], an anti-join
    * drop, an aggregate); the oracle re-derives every stage in SQL including
    * the recursive-CTE components.
    */
  def qCorpusCurationLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = Dedup.dupClusters(
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 3, numHashes = numHashes, rowsPerBand = rowsPerBand, threshold = 0.5))
    val drops = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    docs.join(drops, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("lang"))
  }

  val corpusCurationLshSql: String =
    s"""WITH RECURSIVE $minhashPairCtesSql,
      |pr AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
      |edges AS (SELECT id_a AS a, id_b AS b FROM pr
      |      UNION SELECT id_b, id_a FROM pr),
      |reach(id, r) AS (
      |      SELECT a, a FROM edges UNION SELECT a, b FROM edges
      |      UNION SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id),
      |cl AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      |drops AS (SELECT id AS doc_id FROM cl WHERE id <> cluster_id)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Cross-modal agreement: each text near-dup pair (exact jaccard ≥ 0.5) paired
    * with the cosine of the two docs' embeddings (doc_id ⇔ vec_id) — the check a
    * pipeline runs to see whether text-level and embedding-level similarity agree.
    * Composition showcase: dedup pair generation × vector similarity in one plan.
    */
  def qDupPairCosine(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
      k = 3, threshold = 0.5)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        sqrt(SimSearch.dot(col("embedding"), col("embedding"))).as("nrm"))
    pairs
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
        col("nrm").as("na")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
        col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"),
        round(SimSearch.dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          .as("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val dupPairCosineSql: String =
    s"""WITH $shinglesSql,
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |pr AS (SELECT id_a, id_b,
      |      n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) AS jaccard
      |      FROM p JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
      |      WHERE n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) >= 0.5),
      |e AS (SELECT vec_id, embedding,
      |      sqrt(list_sum(list_transform(generate_series(1, 64),
      |        i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
      |      FROM embeddings)
      |SELECT pr.id_a, pr.id_b, ROUND(pr.jaccard, 6) AS jaccard,
      |  ROUND(list_sum(list_transform(generate_series(1, 64),
      |    i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
      |    / (x.nrm * y.nrm), 6) AS cosine
      |FROM pr JOIN e x ON pr.id_a = x.vec_id JOIN e y ON pr.id_b = y.vec_id
      |ORDER BY pr.id_a, pr.id_b""".stripMargin

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** CTE chain ending in `sims(doc_id, simhash)` — shared by the signature and
    * pair oracles.
    */
  private val simhashCtesSql: String = {
    val bitSums = (0 until 32).map { j =>
      s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN tf ELSE -tf END) AS s_$j"
    }.mkString(",\n      ")
    val sig = (0 until 32).map { j =>
      s"CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""tok AS (SELECT doc_id, tok, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |hh AS (SELECT doc_id, tf, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tok),
      |s AS (SELECT doc_id,
      |      $bitSums
      |      FROM hh GROUP BY doc_id),
      |sims AS (SELECT doc_id, $sig AS simhash FROM s)""".stripMargin
  }

  val dedupSimhashSql: String =
    s"""WITH $simhashCtesSql
      |SELECT doc_id, simhash FROM sims ORDER BY doc_id""".stripMargin

  /** SimHash PAIR detection through the oracle gate: 60-bit signatures
    * banded into 4 × 15-bit blocks (hamming-bounded candidate generation,
    * pigeonhole-exact at maxHamming = 3) + exact hamming verify — the
    * operator [[Dedup.simhashPairs]], previously spec-only. The oracle
    * replays the same bands and `bit_count(xor(...))` verify.
    */
  def qSimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir), "doc_id", "text",
        maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** 60-bit signature replay for the PAIR query (the 32-bit `sims` CTE
    * stays for q_dedup_simhash's signature dump): token hash = first 15
    * md5 hex chars, 60 conditional bit sums, 4 × 15-bit band keys —
    * the [[graft.functions.SimHash60]] convention.
    */
  private val simhash60CtesSql: String = {
    val bitSums = (0 until 60).map { j =>
      s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN tf ELSE -tf END) AS s_$j"
    }.mkString(",\n      ")
    val sig = (0 until 60).map { j =>
      s"CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""tok AS (SELECT doc_id, tok, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |hh AS (SELECT doc_id, tf,
      |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok),
      |s AS (SELECT doc_id,
      |      $bitSums
      |      FROM hh GROUP BY doc_id),
      |sims AS (SELECT doc_id, $sig AS simhash FROM s)""".stripMargin
  }

  val simhashPairsSql: String =
    s"""WITH $simhash60CtesSql,
      |banded AS (SELECT doc_id, b AS band,
      |        (simhash >> (b * 15)) & 32767 AS bkey
      |      FROM sims CROSS JOIN generate_series(0, 3) g(b)),
      |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |      FROM banded x JOIN banded y
      |        ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      |SELECT c.id_a, c.id_b,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM cand c JOIN sims a ON c.id_a = a.doc_id JOIN sims b ON c.id_b = b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  def qDedupEmbed(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
        numPlanes = 8, threshold = 0.2)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("id_a"), col("id_b"))

  /** Sign-LSH bucket expression over `embedding` — the SQL twin of
    * [[SimSearch.lshBucket]], shared by the embedding-dedup and LSH-top-k
    * oracles (same deterministic [[SimSearch.planeSign]] hyperplanes).
    */
  private def lshBucketPlanesSql(numPlanes: Int): String =
    (0 until numPlanes).map { p =>
      val signs = (0 until 64).map(i => SimSearch.planeSign(i, p)).mkString("[", ", ", "]")
      s"""CASE WHEN list_sum(list_transform(generate_series(1, 64),
         |        i -> embedding[i]::DOUBLE * ($signs)[i])) > 0
         |      THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString(" +\n      ")

  val dedupEmbedSql: String = {
    val planes = lshBucketPlanesSql(8)
    s"""WITH b AS (SELECT vec_id, embedding,
      |      $planes AS bucket,
      |    sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
      |    FROM embeddings),
      |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
      |      list_sum(list_transform(generate_series(1, 64),
      |        i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
      |        / (x.nrm * y.nrm) AS cosine
      |      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
      |SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM p
      |WHERE cosine >= 0.2 ORDER BY id_a, id_b""".stripMargin
  }

  // -------------------------------------------------------------------------
  // Similarity search
  // -------------------------------------------------------------------------

  def qSimsearchTopk(spark: SparkSession, dir: String): DataFrame =
    SimSearch.topKForId(Tables.embeddings(spark, dir), "vec_id", "embedding",
        queryId = 0L, k = 10)
      .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))

  val simsearchTopkSql: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |s AS (SELECT e.vec_id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)))) AS cos_raw
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0)
      |SELECT vec_id, ROUND(cos_raw, 6) AS cosine FROM s
      |ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin

  /** Two-stage quantized retrieval: int8 integer-dot shortlist (50) → exact
    * fp32 cosine re-rank to top 10 ([[SimSearch.quantizedRerankTopKForId]]).
    */
  def qSimsearchQuantized(spark: SparkSession, dir: String): DataFrame =
    SimSearch.quantizedRerankTopKForId(Tables.embeddings(spark, dir),
        "vec_id", "embedding", queryId = 0L, k = 10, rerank = 50)
      .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))

  val simsearchQuantizedSql: String =
    """WITH nrm AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS nv
      |  FROM embeddings),
      |nx AS (SELECT vec_id, embedding, nv, list_transform(embedding,
      |    x -> CASE WHEN nv = 0 THEN 0.0 ELSE x::DOUBLE / nv END) AS n
      |  FROM nrm),
      |mxq AS (SELECT vec_id, embedding, nv,
      |    list_max(list_transform(n, x -> abs(x))) AS mx, n
      |  FROM nx),
      |qv AS (SELECT vec_id, embedding, nv, mx, list_transform(n,
      |    x -> CASE WHEN mx = 0 THEN 0 ELSE CAST(ROUND(x * 127.0 / mx) AS BIGINT) END) AS q
      |  FROM mxq),
      |qq AS (SELECT q AS qarr, embedding AS qe, nv AS qn FROM qv WHERE vec_id = 0),
      |sc AS (SELECT v.vec_id, v.embedding, v.nv, v.mx,
      |    CAST(list_sum(list_transform(generate_series(1, 64),
      |      i -> v.q[i] * qq.qarr[i])) AS BIGINT) AS idot
      |  FROM qv v CROSS JOIN qq WHERE v.vec_id <> 0),
      |short AS (SELECT * FROM sc ORDER BY idot::DOUBLE * mx DESC, vec_id LIMIT 50),
      |rr AS (SELECT s.vec_id,
      |    CASE WHEN s.nv * qq.qn = 0 THEN 0.0 ELSE
      |      list_sum(list_transform(generate_series(1, 64),
      |        i -> s.embedding[i]::DOUBLE * qq.qe[i]::DOUBLE)) / (s.nv * qq.qn)
      |    END AS cos_raw
      |  FROM short s CROSS JOIN qq)
      |SELECT vec_id, ROUND(cos_raw, 6) AS cosine FROM rr
      |ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin

  /** Batched service-shape ANN: 5 query vectors resolved against the corpus in one
    * job via the broadcast + bounded-heap-aggregate plan ([[SimSearch.topKForQueries]]).
    */
  def qSimsearchBatch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    SimSearch.topKForQueries(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val simsearchBatchSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
      |    sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS qn
      |  FROM embeddings WHERE vec_id < 5),
      |s AS (SELECT q.query_id, e.vec_id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) * q.qn) AS cos_raw
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      |r AS (SELECT query_id, vec_id, cos_raw,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos_raw DESC, vec_id) AS rank
      |  FROM s)
      |SELECT query_id, rank, vec_id, ROUND(cos_raw, 6) AS cosine
      |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Batched APPROXIMATE ANN through the candidate-pruned LSH path
    * ([[SimSearch.lshTopKForQueries]]): probe-ring bucket equi-join instead of
    * the exact path's full-corpus scan. The oracle replays the SAME bucket
    * arithmetic and ring condition (`bit_count(xor(bucket, qbucket)) <= probe`)
    * in DuckDB, so the approximation itself — which candidates the ring admits —
    * is oracle-checked, not just recall-bounded.
    */
  def qSimsearchLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    SimSearch.lshTopKForQueries(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, numPlanes = 8, maxHammingProbe = 2)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val simsearchLshSql: String = {
    val planes = lshBucketPlanesSql(8)
    s"""WITH b AS (SELECT vec_id, embedding,
      |      $planes AS bucket,
      |    sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
      |    FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, bucket AS qb
      |    FROM b WHERE vec_id < 5),
      |s AS (SELECT q.query_id, c.vec_id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> c.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) / (c.nrm * q.qn) AS cos_raw
      |  FROM b c JOIN q ON bit_count(xor(c.bucket, q.qb)) <= 2
      |    AND c.vec_id <> q.query_id),
      |r AS (SELECT query_id, vec_id, cos_raw,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos_raw DESC, vec_id) AS rank
      |  FROM s)
      |SELECT query_id, rank, vec_id, ROUND(cos_raw, 6) AS cosine
      |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Multi-probe LSH recall/probes curve ([[SimSearch.lshRecallByProbe]]):
    * for probe radius 0..3 over the 8-plane sign-LSH index, what fraction of
    * the exact top-10 (5 queries, brute force) falls inside the probed bucket
    * ring — the measured tuning curve for `maxHammingProbe`, with the probed
    * bucket count alongside as the cost axis.
    */
  def qLshMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    SimSearch.lshRecallByProbe(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, numPlanes = 8, maxRadius = 3)
      .orderBy(col("max_hamming"))
  }

  val lshMultiprobeSql: String = {
    val planes = lshBucketPlanesSql(8)
    s"""WITH b AS (SELECT vec_id, embedding,
      |      $planes AS bucket,
      |    sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
      |    FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, bucket AS qb
      |    FROM b WHERE vec_id < 5),
      |s AS (SELECT q.query_id, c.vec_id, q.qb,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> c.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) / (c.nrm * q.qn)
      |      AS cos_raw,
      |    c.bucket
      |  FROM b c CROSS JOIN q WHERE c.vec_id <> q.query_id),
      |t AS (SELECT query_id, vec_id, bucket, qb,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos_raw DESC, vec_id) AS rank
      |  FROM s),
      |h AS (SELECT bit_count(xor(bucket, qb)) AS h FROM t WHERE rank <= 10),
      |r AS (SELECT * FROM (VALUES (0, 1), (1, 9), (2, 37), (3, 93))
      |    AS v(max_hamming, n_probe_buckets))
      |SELECT CAST(r.max_hamming AS INT) AS max_hamming,
      |  CAST(r.n_probe_buckets AS BIGINT) AS n_probe_buckets,
      |  COUNT(*) AS n_truth_pairs,
      |  CAST(SUM(CASE WHEN h.h <= r.max_hamming THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_found,
      |  ROUND(SUM(CASE WHEN h.h <= r.max_hamming THEN 1 ELSE 0 END) * 1.0
      |    / COUNT(*), 6) AS recall
      |FROM h CROSS JOIN r GROUP BY 1, 2 ORDER BY 1""".stripMargin
  }

  /** End-to-end corpus curation — the composed shape a training-data pipeline runs:
    * quality filter (length band) → exact dedup keeping canonical docs → per-language
    * corpus stats. Exercises operator COMPOSITION under one plan: the filter pushes
    * to the parquet scan, dedup's group-and-join-back consumes the filtered scan, and
    * the final aggregate is map-side partial.
    */
  def qCorpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(col("n_chars").between(100, 2000))
    val canon = Dedup.exactDedup(docs, "doc_id", "text")
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"))
    docs.join(canon, Seq("doc_id"))
      .withColumn("n_tokens",
        length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        round(avg(col("n_chars")), 6).as("avg_chars"))
      .orderBy(col("lang"))
  }

  val corpusCurationSql: String =
    """WITH f AS (SELECT * FROM documents WHERE n_chars BETWEEN 100 AND 2000),
      |g AS (SELECT md5(text) AS h, MIN(doc_id) AS canonical_id FROM f GROUP BY 1),
      |k AS (SELECT f.* FROM f JOIN g ON md5(f.text) = g.h AND f.doc_id = g.canonical_id)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
      |    AS total_tokens,
      |  ROUND(AVG(n_chars), 6) AS avg_chars
      |FROM k GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-label embedding centroids in long format (label, dimension, mean) — class
    * prototypes for embedding-space analysis. posexplode turns the array into
    * (pos, value) rows so the mean is one map-side-partial hash aggregate keyed by
    * (label, pos); no array column ever crosses the shuffle.
    */
  def qLabelCentroid(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
      .agg(round(avg(col("col").cast("double")), 6).as("centroid"))
      .orderBy(col("label"), col("dim"))

  val labelCentroidSql: String =
    """SELECT label, i AS dim,
      |  ROUND(AVG(embedding[i]::DOUBLE), 6) AS centroid
      |FROM embeddings CROSS JOIN generate_series(1, 64) s(i)
      |GROUP BY label, i ORDER BY label, i""".stripMargin

  /** Repeat-purchase intensity via the bucketed range join: for each order, how
    * many OTHER orders the same customer placed in the 90 days ending at (and
    * including) that order's date. Zero-count orders are kept via the left
    * join-back. The oracle uses DuckDB's plain inequality join — same semantics,
    * different algorithm.
    */
  def qRepeatOrders(spark: SparkSession, dir: String): DataFrame = {
    val day = 86400000L
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        (unix_timestamp(col("o_orderdate")) * 1000).as("pms"))
    val iv = base.select(col("o_orderkey").as("iv_orderkey"),
      col("o_custkey").as("iv_custkey"), col("pms").as("ivs"),
      (col("pms") + lit(90L * day)).as("ive"))
    val counts = RangeJoin.rangeJoinPairs(base, iv,
        "o_custkey", "iv_custkey", "pms", "ivs", "ive", bucketWidth = 90L * day)
      .filter(col("o_orderkey") =!= col("iv_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("__n"))
    base.join(counts, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("__n"), lit(0L)).cast("long").as("n_prior_90d"))
      .orderBy(col("o_orderkey"))
  }

  /** Concurrent-order detection: pairs of a customer's orders whose 30-day
    * fulfillment windows overlap ([[RangeJoin.intervalOverlapPairs]] — the
    * interval×interval companion to the point-in-interval range join; each
    * pair emerges exactly once from its overlap-start bucket, no distinct).
    * The oracle is DuckDB's plain inequality self-join.
    */
  def qOrderOverlap(spark: SparkSession, dir: String): DataFrame = {
    val day = 86400000L
    val base = Tables.orders(spark, dir).select(col("o_custkey"),
        col("o_orderkey"), (unix_timestamp(col("o_orderdate")) * 1000).as("s"))
      .withColumn("e", col("s") + lit(30L * day))
    val a = base.select(col("o_custkey").as("cust_a"),
      col("o_orderkey").as("okey_a"), col("s").as("sa"), col("e").as("ea"))
    val b = base.select(col("o_custkey").as("cust_b"),
      col("o_orderkey").as("okey_b"), col("s").as("sb"), col("e").as("eb"))
    RangeJoin.intervalOverlapPairs(a, b, "cust_a", "cust_b",
        "sa", "ea", "sb", "eb", bucketWidth = 30L * day)
      .filter(col("okey_a") < col("okey_b"))
      .select(col("cust_a").as("o_custkey"), col("okey_a"), col("okey_b"),
        ((least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
          / lit(day)).cast("long").as("overlap_days"))
      .orderBy(col("o_custkey"), col("okey_a"), col("okey_b"))
  }

  val orderOverlapSql: String =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    CAST(epoch(o_orderdate) AS BIGINT) * 1000 AS s,
      |    CAST(epoch(o_orderdate) AS BIGINT) * 1000 + 2592000000 AS e
      |  FROM orders)
      |SELECT a.o_custkey, a.o_orderkey AS okey_a, b.o_orderkey AS okey_b,
      |  CAST((least(a.e, b.e) - greatest(a.s, b.s)) / 86400000 AS BIGINT)
      |    AS overlap_days
      |FROM o a JOIN o b ON a.o_custkey = b.o_custkey
      |  AND a.o_orderkey < b.o_orderkey AND a.s < b.e AND b.s < a.e
      |ORDER BY a.o_custkey, okey_a, okey_b""".stripMargin

  val repeatOrdersSql: String =
    """WITH p AS (SELECT o_orderkey, o_custkey,
      |    CAST(epoch(o_orderdate) AS BIGINT) * 1000 AS ms FROM orders)
      |SELECT a.o_orderkey, COUNT(b.o_orderkey) AS n_prior_90d
      |FROM p a LEFT JOIN p b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderkey <> b.o_orderkey
      |  AND a.ms >= b.ms AND a.ms < b.ms + 7776000000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Deterministic train/val/test assignment: split is a pure md5-bucket function
    * of doc_id (reproducible, join-free, stable under data growth); the query
    * reports the per-(lang, split) composition of the corpus.
    */
  def qDatasetSplit(spark: SparkSession, dir: String): DataFrame =
    Splits.withSplit(Tables.documents(spark, dir), "doc_id",
        trainPct = 80, valPct = 10)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))

  val datasetSplitSql: String =
    """WITH b AS (SELECT lang,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bk
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Balanced corpus sample: at most 50 docs per language, drawn by deterministic
    * md5-of-id order ([[Splits.balancedSample]]).
    */
  def qBalancedSample(spark: SparkSession, dir: String): DataFrame =
    Splits.balancedSample(
        Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", maxPerGroup = 50)
      .orderBy(col("lang"), col("doc_id"))

  val balancedSampleSql: String =
    """WITH r AS (SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, lang FROM r WHERE rk <= 50 ORDER BY lang, doc_id""".stripMargin

  /** TF-IDF top-3 terms per document (smoothed idf, rank window with term
    * tie-break).
    */
  def qTfidf(spark: SparkSession, dir: String): DataFrame =
    TextStats.tfidfTopTerms(Tables.documents(spark, dir), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rank"))

  val tfidfSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
      |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
      |    tf.tf * ln((n.n + 1) / (dfreq.df + 1)) AS tfidf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      |r AS (SELECT s.*, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term) AS rank FROM s)
      |SELECT doc_id, rank, term, tf, df, ROUND(tfidf, 6) AS tfidf
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Per-language document-length quantiles — exact `percentile` (linear
    * interpolation, same R-7 definition as DuckDB's `quantile_cont`). At extreme
    * scale swap for `percentile_approx` (t-digest sketch, map-side mergeable) —
    * the exact form shuffles per-group value multisets.
    */
  def qQualityQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(round(expr("percentile(n_chars, 0.5)"), 6).as("p50_chars"),
        round(expr("percentile(n_chars, 0.9)"), 6).as("p90_chars"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))

  val qualityQuantilesSql: String =
    """SELECT lang,
      |  ROUND(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
      |  ROUND(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------------------------
  // Text analysis
  // -------------------------------------------------------------------------

  def qTextStats(spark: SparkSession, dir: String): DataFrame =
    TextStats.qualityDF(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val stopRegexes = Seq("the", "and", "of", "to", "a", "in", "is", "it")
    .map(w => s"len(regexp_extract_all(text, '\\b$w\\b'))")
  private[graft] val stopCountSql = stopRegexes.mkString("(", " + ", ")")

  val textStatsSql: String =
    s"""WITH t AS (SELECT doc_id, text, length(text) AS n_chars,
      |    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
      |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
      |    $stopCountSql AS stop FROM documents)
      |SELECT doc_id, n_chars, n_tokens,
      |  ROUND((n_chars - n_tokens + 1) * 1.0 / n_tokens, 6) AS avg_token_len,
      |  ROUND(alpha_chars * 1.0 / n_chars, 6) AS alpha_ratio,
      |  ROUND(stop * 1.0 / n_tokens, 6) AS stopword_ratio,
      |  ROUND(CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END
      |    + 0.3 * (alpha_chars * 1.0 / n_chars)
      |    + 0.3 * least(1.0, stop * 10.0 / n_tokens), 6) AS quality_score
      |FROM t ORDER BY doc_id""".stripMargin

  def qLangId(spark: SparkSession, dir: String): DataFrame =
    TextStats.langIdDF(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val langIdSql: String =
    s"""WITH t AS (SELECT doc_id,
      |    $stopCountSql AS stopword_hits,
      |    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
      |  FROM documents)
      |SELECT doc_id, stopword_hits, n_tokens,
      |  CASE WHEN stopword_hits * 25 >= n_tokens * 2 THEN 'en'
      |       WHEN stopword_hits > 0 THEN 'en-maybe' ELSE 'unk' END AS lang_pred
      |FROM t ORDER BY doc_id""".stripMargin

  /** Multi-language fixture shared by the Spark query and the VALUES oracle —
    * the generated corpus is same-language synthetic text, so an on-corpus
    * multi-class check would be vacuous (same reasoning as [[piiFixture]]).
    */
  private[graft] val langFixture: Seq[(Long, String)] = Seq(
    (1L, "the cat sat on the mat and it is clear that you saw it leave"),
    (2L, "la casa de la madre es el lugar que los vecinos aman por siempre"),
    (3L, "der hund und die katze laufen von der stadt zu den feldern mit sich"),
    (4L, "le chien et les enfants jouent dans un jardin du village pour une heure"),
    (5L, "zzz qqq xxx words without common function tokens whatsoever"))

  def qLangIdMulti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TextStats.langIdMultiDF(langFixture.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val langIdMultiSql: String = {
    val docs = langFixture
      .map { case (id, text) => s"(CAST($id AS BIGINT), '$text')" }
      .mkString(",\n    ")
    val profile = TextStats.langProfiles
      .flatMap { case (lang, toks) => toks.map(t => s"('$t', '$lang')") }
      .mkString(", ")
    s"""WITH docs(doc_id, text) AS (VALUES
      |    $docs),
      |profile(tok, plang) AS (VALUES $profile),
      |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |    FROM docs),
      |h AS (SELECT doc_id, plang, COUNT(*) AS n_hits
      |    FROM tok JOIN profile USING (tok) GROUP BY 1, 2),
      |r AS (SELECT doc_id, plang, n_hits,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY n_hits DESC, plang) AS rn FROM h)
      |SELECT d.doc_id, COALESCE(r.plang, 'unk') AS lang_pred,
      |  CAST(COALESCE(r.n_hits, 0) AS BIGINT) AS n_hits
      |FROM docs d LEFT JOIN r ON d.doc_id = r.doc_id AND r.rn = 1
      |ORDER BY d.doc_id""".stripMargin
  }

  def qTokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
        TextStats.wsTokenCount(col("text")).as("ws_tokens"),
        TextStats.regexTokenCount(col("text")).cast("long").as("regex_tokens"))
      .orderBy(col("doc_id"))
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS regex_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------------
  // Multimodal
  // -------------------------------------------------------------------------

  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal
      .metaExprDF(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val multimodalMetaSql: String =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  1 + (h & 1023) AS width, 1 + ((h >> 10) & 1023) AS height,
      |  CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
      |FROM (SELECT doc_id, text,
      |      ('0x' || substr(md5(text), 1, 8))::BIGINT AS h FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Byte-histogram features through the REAL per-partition batch path
    * ([[graft.multimodal.Multimodal.featurize]] — the mapPartitions codec loop, not
    * a column expression), exploded to long format. The oracle replays the
    * histogram in SQL: the corpus is ASCII, so each byte is `ascii(substr(...))`
    * and the bin is integer `code*16//256`; absent bins densify to 0 via a
    * generate_series cross join.
    */
  def qMultimodalHist(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.withFakeMedia(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), "text")
    graft.multimodal.Multimodal.featurize(media, "media", bins = 16)
      .select(col("doc_id"), posexplode(col("features")))
      .select(col("doc_id"), col("pos").cast("long").as("bin"),
        round(col("col"), 6).as("frac"))
      .orderBy(col("doc_id"), col("bin"))
  }

  val multimodalHistSql: String =
    """WITH ch AS (SELECT doc_id, text,
      |    unnest(generate_series(1, length(text))) AS i FROM documents),
      |agg AS (SELECT doc_id, (ascii(substr(text, i, 1)) * 16) // 256 AS bin,
      |    COUNT(*) AS c FROM ch GROUP BY 1, 2),
      |dn AS (SELECT doc_id, length(text) AS n FROM documents),
      |bins AS (SELECT doc_id, n, b AS bin
      |  FROM dn CROSS JOIN generate_series(0, 15) g(b))
      |SELECT b.doc_id, b.bin, ROUND(COALESCE(a.c, 0) * 1.0 / b.n, 6) AS frac
      |FROM bins b LEFT JOIN agg a ON b.doc_id = a.doc_id AND b.bin = a.bin
      |ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------------
  // Event-time operators
  // -------------------------------------------------------------------------

  def qEventHourly(spark: SparkSession, dir: String): DataFrame =
    EventWindows.hourlyStats(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  val eventHourlySql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
      |  event_type, COUNT(*) AS n_events,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_value,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Sliding 1h/30min windows per event type — each event lands in exactly two
    * windows. The oracle replays Spark's epoch-aligned `window()` semantics with a
    * 2-way generate_series fan-out: window starts are the event's 30-min floor
    * boundary and the one before it.
    */
  def qSlidingHourly(spark: SparkSession, dir: String): DataFrame =
    EventWindows.slidingStats(Tables.events(spark, dir), "1 hour", "30 minutes")
      .orderBy(col("window_start"), col("event_type"))

  val slidingHourlySql: String =
    """WITH e AS (SELECT event_type, value, epoch_ms(ts) / 1000.0 AS es FROM events),
      |w AS (SELECT event_type, value,
      |    CAST(floor(es / 1800) * 1800 - k * 1800 AS BIGINT) AS window_start
      |  FROM e CROSS JOIN generate_series(0, 1) s(k))
      |SELECT window_start, window_start + 3600 AS window_end, event_type,
      |  COUNT(*) AS n_events,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_value
      |FROM w GROUP BY 1, 3 ORDER BY 1, 3""".stripMargin

  /** Catalog coverage over time: per hour, the fraction of the customer base active
    * in events — the event-time variant of the coverage metric.
    */
  def qCoverageTime(spark: SparkSession, dir: String): DataFrame =
    EventWindows.coverageOverTime(Tables.events(spark, dir),
        Tables.customer(spark, dir), "user_id", "c_custkey")
      .orderBy(col("window_start"))

  val coverageTimeSql: String =
    """WITH c AS (SELECT COUNT(DISTINCT c_custkey) AS cat FROM customer)
      |SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
      |  COUNT(DISTINCT user_id) AS n_items,
      |  ROUND(COUNT(DISTINCT user_id) * 1.0 / (SELECT cat FROM c), 6) AS coverage
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** As-of join: each event picks up the most recent prior order-day aggregate of
    * its user ([[AsOfJoin.asOf]] — union + carry-forward window, one shuffle).
    * The oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, so the semantics (inclusive
    * bound, null when no prior order) are checked against an independent
    * first-class implementation.
    */
  def qAsofLastOrder(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), (unix_timestamp(col("o_orderdate")) * 1000).as("oms"))
      .agg(count(lit(1)).as("n_day"),
        round(sum(AnalyticsQueries.dec(col("o_totalprice"))).cast("double"), 6)
          .as("day_total"))
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ems"))
    AsOfJoin.asOf(e, o, "user_id", "o_custkey", "ems", "oms",
        Seq("oms", "n_day", "day_total"))
      .orderBy(col("event_id"))
  }

  val asofLastOrderSql: String =
    """WITH o AS (SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) * 1000 AS oms,
      |    COUNT(*) AS n_day,
      |    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6) AS day_total
      |  FROM orders GROUP BY 1, 2),
      |e AS (SELECT event_id, user_id, epoch_ms(ts) AS ems FROM events)
      |SELECT e.event_id, e.user_id, e.ems, o.oms, o.n_day, o.day_total
      |FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ems >= o.oms
      |ORDER BY e.event_id""".stripMargin

  /** The as-of whale-key guard oracle-verified: [[AsOfJoin.asOfChunked]] must
    * produce output identical to [[AsOfJoin.asOf]] (chunk-local carry-forward +
    * cross-chunk tail merge), so it runs the same query as [[qAsofLastOrder]]
    * against the same DuckDB native `ASOF LEFT JOIN` oracle.
    */
  def qAsofChunked(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), (unix_timestamp(col("o_orderdate")) * 1000).as("oms"))
      .agg(count(lit(1)).as("n_day"),
        round(sum(AnalyticsQueries.dec(col("o_totalprice"))).cast("double"), 6)
          .as("day_total"))
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ems"))
    AsOfJoin.asOfChunked(e, o, "user_id", "o_custkey", "ems", "oms",
        Seq("oms", "n_day", "day_total"), chunkMs = 86400000L)
      .orderBy(col("event_id"))
  }

  def qSessionize(spark: SparkSession, dir: String): DataFrame =
    EventWindows.sessionize(Tables.events(spark, dir), gapMinutes = 30)
      .orderBy(col("user_id"), col("session_id"))

  val sessionizeSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
      |f AS (SELECT user_id, ms,
      |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
      |s AS (SELECT user_id, ms,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM f)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ms) AS start_ms, MAX(ms) AS end_ms, MAX(ms) - MIN(ms) AS duration_ms
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The whale-user skew guard oracle-verified: [[EventWindows.sessionizeChunked]]
    * produces output identical to [[EventWindows.sessionize]] by construction
    * (chunk-local sessions re-merged across boundaries), so it shares
    * [[sessionizeSql]] — the guard itself goes through the correctness gate.
    */
  def qSessionizeChunked(spark: SparkSession, dir: String): DataFrame =
    EventWindows.sessionizeChunked(Tables.events(spark, dir), gapMinutes = 30,
        chunk = "day")
      .orderBy(col("user_id"), col("session_id"))

  def qEventProps(spark: SparkSession, dir: String): DataFrame =
    EventWindows.propsStats(Tables.events(spark, dir))
      .orderBy(col("event_type"))

  val eventPropsSql: String =
    """WITH e AS (SELECT event_type,
      |    CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type, COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  ROUND(AVG(k), 6) AS avg_k, MAX(k) AS max_k
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------------
  // Classic analytics (bench headliners)
  // -------------------------------------------------------------------------

  // exact DECIMAL sums for money columns — see AnalyticsQueries.dec rationale
  private def dec(c: org.apache.spark.sql.Column) = AnalyticsQueries.dec(c)

  def qPricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      // the three whole-table sums pass 1e10 at sf1.0 where a 1e-6 round
      // increment is below double ulp — round the exact decimal at 2 dp
      // and cast (r15 sf1.0 value-hash gate discipline); the per-line
      // averages stay small-magnitude doubles
      .agg(
        sum(dec(col("l_quantity"))).cast("decimal(38,2)")
          .cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("decimal(38,2)")
          .cast("double").as("sum_base_price"),
        AnalyticsQueries.revenueDec(col("l_extendedprice"), col("l_discount"))
          .cast("decimal(38,2)").cast("double").as("sum_disc_price"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(${AnalyticsQueries.revenueDecSql}, 2) AS DOUBLE) AS sum_disc_price,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def qBrandRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      // DECIMAL-space round before the double cast: per-brand revenue
      // passes 1e10 at sf1.0, where a 1e-6 round increment sits BELOW
      // double ulp and the engines pick adjacent doubles (the r15 sf1.0
      // value-hash gate caught it); 2-dp money rounding on the exact
      // decimal is deterministic on both sides at any magnitude.
      .agg(AnalyticsQueries.revenueDec(col("l_extendedprice"), col("l_discount"))
          .cast("decimal(38,2)").cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))

  val brandRevenueSql: String =
    s"""SELECT p_brand,
      |  CAST(ROUND(${AnalyticsQueries.revenueDecSql}, 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------------
  // Corpus quality (Gopher/C4-style), n-gram stats, PII (round 3)
  // -------------------------------------------------------------------------

  def qGopherQuality(spark: SparkSession, dir: String): DataFrame =
    TextQuality.gopherSignals(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Bigram CTE shared by the quality + top-ngram oracles: slice+array_to_string
    * mirrors WordShingles' short-document behavior (a 1-token doc yields its one
    * token, not a NULL from concatenating a missing element).
    */
  private val bigramsSql =
    """bg AS (SELECT doc_id, unnest(list_transform(
      |    generate_series(1, greatest(len(l) - 1, 1)),
      |    i -> array_to_string(l[i:i+1], ' '))) AS b
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))""".stripMargin

  val gopherQualitySql: String =
    s"""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |    FROM documents),
      |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tf GROUP BY 1, 2),
      |ta AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_distinct, MAX(c) AS max_tf FROM tc GROUP BY 1),
      |$bigramsSql,
      |ba AS (SELECT doc_id, COUNT(*) AS n_bg, COUNT(DISTINCT b) AS n_distinct_bg
      |    FROM bg GROUP BY 1)
      |SELECT ta.doc_id, n_tokens,
      |  ROUND(n_distinct * 1.0 / n_tokens, 6) AS type_token_ratio,
      |  ROUND(max_tf * 1.0 / n_tokens, 6) AS top_token_ratio,
      |  ROUND(1 - n_distinct_bg * 1.0 / n_bg, 6) AS dup_bigram_frac,
      |  (max_tf * 1.0 / n_tokens <= 0.20
      |    AND 1 - n_distinct_bg * 1.0 / n_bg <= 0.30) AS keep
      |FROM ta JOIN ba ON ta.doc_id = ba.doc_id ORDER BY ta.doc_id""".stripMargin

  def qTopNgrams(spark: SparkSession, dir: String): DataFrame =
    TextQuality.topNgrams(Tables.documents(spark, dir), "doc_id", "text",
        k = 2, topN = 20)
      .orderBy(col("rank"))

  val topNgramsSql: String =
    s"""WITH $bigramsSql,
      |sh AS (SELECT DISTINCT doc_id, b AS ngram FROM bg),
      |f AS (SELECT ngram, COUNT(*) AS doc_freq FROM sh GROUP BY 1
      |      ORDER BY doc_freq DESC, ngram LIMIT 20)
      |SELECT ngram, doc_freq,
      |  CAST(ROW_NUMBER() OVER (ORDER BY doc_freq DESC, ngram) AS BIGINT) AS rank
      |FROM f ORDER BY rank""".stripMargin

  /** PII fixture shared verbatim by the Spark query and the VALUES-based oracle —
    * the generated corpus has no PII, so an on-corpus query would be a vacuous
    * all-zeros check; a literal fixture exercises the regex semantics for real
    * (and proves the pattern strings behave identically under java.util.regex
    * and RE2).
    */
  private[graft] val piiFixture: Seq[(Long, String)] = Seq(
    (1L, "reach us at alice.smith@example.com or 555-123-4567 during business hours"),
    (2L, "ssn on file 123-45-6789 card 4111 1111 1111 1111 expires soon"),
    (3L, "no sensitive content in this row just plain words"),
    (4L, "bob@corp.io and carol@site.org both wrote while 999-555-0199 rang"))

  def qPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = piiFixture.toDF("doc_id", "text")
    TextQuality.piiCounts(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"),
        TextQuality.redactPii(col("text")).as("redacted")), "doc_id")
      .select(col("doc_id"), col("redacted"), col("n_emails"), col("n_cards"),
        col("n_ssns"), col("n_phones"))
      .orderBy(col("doc_id"))
  }

  val piiRedactSql: String = {
    val values = piiFixture
      .map { case (id, text) => s"(CAST($id AS BIGINT), '$text')" }
      .mkString(",\n    ")
    import TextQuality.{EmailRe, CardRe, SsnRe, PhoneRe}
    s"""WITH docs(doc_id, text) AS (VALUES
      |    $values)
      |SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      |    '$EmailRe', '<EMAIL>', 'g'),
      |    '$CardRe', '<CARD>', 'g'),
      |    '$SsnRe', '<SSN>', 'g'),
      |    '$PhoneRe', '<PHONE>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '$CardRe')) AS BIGINT) AS n_cards,
      |  CAST(len(regexp_extract_all(text, '$SsnRe')) AS BIGINT) AS n_ssns,
      |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones
      |FROM docs ORDER BY doc_id""".stripMargin
  }

  /** Per-language document-length deciles via NTILE — the window partitions on
    * `lang`, so decile assignment parallelizes across languages (a GLOBAL ntile
    * would be a single-partition window; at corpus scale use approx-quantile
    * boundaries instead, [[graft.ext.TextStats.groupQuantilesApprox]]).
    */
  def qQualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("decile", ntile(10).over(byLang).cast("long"))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("decile"))
  }

  val qualityDecilesSql: String =
    """WITH d AS (SELECT lang, n_chars,
      |    NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS decile
      |  FROM documents)
      |SELECT lang, CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_docs,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def qUnigramNll(spark: SparkSession, dir: String): DataFrame =
    TextQuality.unigramNll(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val unigramNllSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |    FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |corpus AS (SELECT t, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM corpus)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
      |  ROUND(-CAST(SUM(CAST(tf * ln(cnt * 1.0 / total) AS DECIMAL(18,8)))
      |      AS DOUBLE) / CAST(SUM(tf) AS BIGINT), 6) AS avg_nll
      |FROM tf JOIN corpus USING (t) CROSS JOIN tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Benchmark set = every 100th document (simulated eval suite); the query
    * scores the REST of the corpus against it.
    */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextQuality.contamination(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", k = 3)
      .orderBy(col("doc_id"))
  }

  val contaminationSql: String =
    s"""WITH $shinglesSql,
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 100 = 0),
      |docsh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 100 <> 0),
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM docsh GROUP BY 1),
      |h AS (SELECT doc_id, COUNT(*) AS n_hit FROM docsh
      |    WHERE sh IN (SELECT sh FROM bench) GROUP BY 1)
      |SELECT doc_id, n_sh, COALESCE(n_hit, 0) AS n_hit,
      |  ROUND(COALESCE(n_hit, 0) * 1.0 / n_sh, 6) AS contamination
      |FROM n LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Pair-level contamination: which benchmark docs leak into which corpus
    * docs (same %100 benchmark convention as [[qContamination]]). The
    * synthetic corpus has no real benchmark leakage (max containment ≈ 0.09),
    * so the demo threshold sits at 0.04 to keep the check non-vacuous — a
    * production decontamination pass runs the same plan at ~0.8.
    */
  def qContainment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextQuality.containmentPairs(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", k = 3, threshold = 0.04)
      .select(col("bench_id"), col("doc_id"), col("n_bench"), col("n_shared"),
        round(col("containment"), 6).as("containment"))
      .orderBy(col("bench_id"), col("doc_id"))
  }

  val containmentSql: String =
    s"""WITH $shinglesSql,
      |bsh AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 100 = 0),
      |bn AS (SELECT bench_id, COUNT(*) AS n_bench FROM bsh GROUP BY 1),
      |dsh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 100 <> 0),
      |p AS (SELECT bench_id, doc_id, COUNT(*) AS n_shared
      |      FROM bsh JOIN dsh USING (sh) GROUP BY 1, 2)
      |SELECT bench_id, doc_id, n_bench, n_shared,
      |  ROUND(n_shared * 1.0 / n_bench, 6) AS containment
      |FROM p JOIN bn USING (bench_id)
      |WHERE n_shared * 1.0 / n_bench >= 0.04
      |ORDER BY bench_id, doc_id""".stripMargin

  /** First-BPE-iteration merge-pair table over the corpus vocabulary. */
  def qBpePairs(spark: SparkSession, dir: String): DataFrame =
    TextStats.bpePairStats(Tables.documents(spark, dir), "text", topN = 20)

  /** Full BPE merge training ([[graft.ext.BpeTrain.train]], 16 merges over
    * the ≥2-freq vocabulary). No SQL oracle — the merge recurrence is not
    * SQL-expressible (driver records the rows-only check); the semantics gate
    * is BpeTrainSpec's golden fixture from the original paper.
    */
  def qBpeTrain(spark: SparkSession, dir: String): DataFrame =
    graft.ext.BpeTrain.trainDF(spark, Tables.documents(spark, dir), "text",
      nMerges = 16, minFreq = 2)

  /** Train-then-encode composition: learn 16 merges, tokenize the corpus with
    * them, report per-doc BPE sequence lengths ([[graft.ext.BpeTrain.encode]];
    * rows-only check, like [[qBpeTrain]]).
    */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = graft.ext.BpeTrain.train(docs, "text", nMerges = 16, minFreq = 2)
    graft.ext.BpeTrain.encode(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  val bpePairsSql: String =
    """WITH w AS (SELECT word, COUNT(*) AS n FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE len(word) >= 2 GROUP BY 1),
      |p AS (SELECT n, unnest(list_transform(
      |    generate_series(1, len(word) - 1),
      |    i -> substr(word, i, 2))) AS pair FROM w),
      |a AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occ FROM p GROUP BY 1)
      |SELECT pair, n_occ FROM a ORDER BY n_occ DESC, pair LIMIT 20""".stripMargin

  /** Zipf fit over the top-100 vocabulary head. */
  def qZipfSlope(spark: SparkSession, dir: String): DataFrame =
    TextStats.zipfSlope(Tables.documents(spark, dir), "text", topN = 100)

  val zipfSlopeSql: String =
    """WITH v AS (SELECT t, COUNT(*) AS n FROM (
      |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY 1 ORDER BY n DESC, t LIMIT 100),
      |r AS (SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, t) AS DOUBLE)) AS x,
      |    ln(CAST(n AS DOUBLE)) AS y FROM v),
      |a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m,
      |    CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(18,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(18,8))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(18,8))) AS DOUBLE) AS sxx FROM r)
      |SELECT CAST(m AS BIGINT) AS n_terms,
      |  ROUND((sxy - sx * sy / m) / (sxx - sx * sx / m), 6) AS slope,
      |  ROUND(sy / m - ((sxy - sx * sy / m) / (sxx - sx * sx / m)) * (sx / m), 6)
      |    AS intercept
      |FROM a""".stripMargin

  /** Heaps'-law vocabulary growth over 10 id-ordered corpus prefixes. */
  def qHeapsLaw(spark: SparkSession, dir: String): DataFrame =
    TextStats.heapsLaw(Tables.documents(spark, dir), "doc_id", "text",
        buckets = 10)
      .orderBy(col("bkt"))

  val heapsLawSql: String =
    """WITH n AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
      |tok AS (SELECT CAST(FLOOR(doc_id * 10 / n.n) AS BIGINT) AS bkt,
      |    unnest(string_split(text, ' ')) AS t
      |  FROM documents CROSS JOIN n),
      |tb AS (SELECT bkt, COUNT(*) AS n_tokens FROM tok GROUP BY 1),
      |fb AS (SELECT t, MIN(bkt) AS bkt FROM tok GROUP BY 1),
      |nv AS (SELECT bkt, COUNT(*) AS new_terms FROM fb GROUP BY 1)
      |SELECT tb.bkt, tb.n_tokens,
      |  CAST(SUM(tb.n_tokens) OVER w AS BIGINT) AS cum_tokens,
      |  COALESCE(nv.new_terms, 0) AS new_terms,
      |  CAST(SUM(COALESCE(nv.new_terms, 0)) OVER w AS BIGINT) AS cum_vocab
      |FROM tb LEFT JOIN nv USING (bkt)
      |WINDOW w AS (ORDER BY tb.bkt ROWS BETWEEN UNBOUNDED PRECEDING
      |  AND CURRENT ROW)
      |ORDER BY bkt""".stripMargin

  /** Exact-duplicate rate per source — the first number a curation run
    * reports per feed (a source whose dup rate jumps is re-crawling itself).
    * Composition: [[Dedup.exactDedup]] ⋈ the source dimension.
    */
  def qDupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select(col("doc_id"), col("source"))
      .join(Dedup.exactDedup(docs, "doc_id", "text"), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("canonical_id"), 1L).otherwise(0L))
          .as("n_dropped"))
      .select(col("source"), col("n_docs"), col("n_dropped"),
        round(col("n_dropped").cast("double") / col("n_docs"), 6).as("dup_rate"))
      .orderBy(col("source"))
  }

  val dupRateBySourceSql: String =
    """WITH g AS (SELECT md5(text) AS h, MIN(doc_id) AS canonical_id
      |  FROM documents GROUP BY 1),
      |x AS (SELECT d.doc_id, d.source, g.canonical_id
      |  FROM documents d JOIN g ON md5(d.text) = g.h)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN doc_id <> canonical_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dropped,
      |  ROUND(CAST(SUM(CASE WHEN doc_id <> canonical_id THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*), 6) AS dup_rate
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  /** Character-trigram entropy per source in bits — the gibberish/mojibake
    * detector: natural language sits in a tight entropy band; binary spew or
    * repeated templates fall far outside it. Per-term contributions go
    * through DECIMAL (the userTypeEntropy discipline) so the sums are
    * partition-order-independent and engine-identical. One scan-proportional
    * explode, then (source, trigram)-keyed aggregates.
    */
  def qCharNgramEntropy(spark: SparkSession, dir: String): DataFrame = {
    val ln2 = 0.6931471805599453
    // native kernel: the HOF substr formulation is CodegenFallback and was
    // ~half this query's budget at sf0.1 (the WordShingles lesson)
    val tri = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.CharNgrams.ngrams(col("text"), 3)).as("g"))
    val c = tri.groupBy(col("source"), col("g")).agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("source"))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("n_grams"))
    val p = col("n").cast("double") / col("tot")
    c.join(t, Seq("source"))
      .select(col("source"), col("tot"), col("n_grams"),
        (-p * log(p) / lit(ln2)).cast("decimal(18,8)").as("term"))
      .groupBy(col("source"))
      .agg(max(col("tot")).as("n_total"), max(col("n_grams")).as("n_distinct"),
        round(sum(col("term")).cast("double"), 6).as("entropy_bits"))
      .orderBy(col("source"))
  }

  val charNgramEntropySql: String =
    """WITH tri AS (SELECT source, unnest(list_transform(
      |    generate_series(1, greatest(len(text) - 2, 1)),
      |    i -> substr(text, i, 3))) AS g FROM documents),
      |c AS (SELECT source, g, COUNT(*) AS n FROM tri GROUP BY 1, 2),
      |t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot,
      |    COUNT(*) AS n_grams FROM c GROUP BY 1)
      |SELECT c.source, MAX(t.tot) AS n_total, MAX(t.n_grams) AS n_distinct,
      |  ROUND(CAST(SUM(CAST(-(CAST(n AS DOUBLE) / tot) *
      |    ln(CAST(n AS DOUBLE) / tot) / 0.6931471805599453
      |    AS DECIMAL(18,8))) AS DOUBLE), 6) AS entropy_bits
      |FROM c JOIN t USING (source) GROUP BY 1 ORDER BY 1""".stripMargin

  /** Cross-source near-duplicate overlap: for each ordered source pair, how
    * many near-dup pairs (shingle Jaccard ≥ 0.5) span the two feeds — the
    * redundancy matrix that decides which upstream feed to drop. Composition:
    * the exact pair table ⋈ the source dimension twice; the pair table is
    * tiny relative to the corpus, so both dimension joins broadcast.
    */
  def qSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")),
        Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")),
        Seq("id_b"))
      .select(least(col("src_a"), col("src_b")).as("source_1"),
        greatest(col("src_a"), col("src_b")).as("source_2"))
      .groupBy(col("source_1"), col("source_2"))
      .agg(count(lit(1)).as("n_dup_pairs"))
      .orderBy(col("source_1"), col("source_2"))
  }

  val sourceOverlapSql: String =
    s"""WITH $shinglesSql,
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pr AS (SELECT id_a, id_b FROM p
      |      JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
      |      WHERE n_shared * 1.0 / (na.n_sh + nb.n_sh - n_shared) >= 0.5),
      |s AS (SELECT LEAST(da.source, db.source) AS source_1,
      |    GREATEST(da.source, db.source) AS source_2
      |  FROM pr JOIN documents da ON pr.id_a = da.doc_id
      |  JOIN documents db ON pr.id_b = db.doc_id)
      |SELECT source_1, source_2, COUNT(*) AS n_dup_pairs
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Boolean AND search for three common corpus terms. */
  def qKeywordAnd(spark: SparkSession, dir: String): DataFrame =
    TextStats.keywordAndSearch(Tables.documents(spark, dir), "doc_id", "text",
        Seq("join", "hash", "scan"))
      .orderBy(col("doc_id"))

  val keywordAndSql: String =
    """WITH tok AS (SELECT DISTINCT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE t IN ('join', 'hash', 'scan'))
      |SELECT doc_id FROM tok GROUP BY 1 HAVING COUNT(*) = 3
      |ORDER BY doc_id""".stripMargin

  /** Embedding-space quality eval: 1-NN label agreement on a deterministic
    * 10% query sample (every vector whose id ≡ 0 mod 10 finds its nearest
    * OTHER vector by cosine; agreement of their labels per query label). The
    * kNN leg is [[SimSearch.topKForQueries]] — broadcast queries, corpus
    * never shuffles, bounded-heap top-1 — so the eval is the search service's
    * own plan pointed at itself. High agreement ⇒ the space clusters by
    * label; a drop after re-embedding is the retrain regression alarm.
    */
  def qKnnLabelAcc(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // FIXED probe panel (200 vectors): an accuracy estimator's error is set
    // by the panel size, not the corpus — and a panel that grows with the
    // corpus makes the probe join quadratic (the r13 sf1.0 probe measured
    // 44x time for 10x data with `vec_id % 10 = 0` alone; the cap restores
    // panel x corpus = O(corpus)).
    val nn = SimSearch.topKForQueries(emb,
      emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 2000),
      "vec_id", "embedding", k = 1)
    nn.join(emb.select(col("vec_id").as("query_id"), col("label").as("q_label")),
        Seq("query_id"))
      .join(emb.select(col("vec_id"), col("label").as("n_label")), Seq("vec_id"))
      .groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("q_label") === col("n_label"), 1L).otherwise(0L))
          .as("n_match"))
      .select(col("label"), col("n_queries"), col("n_match"),
        round(col("n_match").cast("double") / col("n_queries"), 6).as("acc"))
      .orderBy(col("label"))
  }

  val knnLabelAccSql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlab
      |  FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 2000),
      |s AS (SELECT q.qid, q.qlab, e.label AS nlab,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)))) AS cos, e.vec_id
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
      |r AS (SELECT qid, qlab, nlab FROM (SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn FROM s)
      |  WHERE rn = 1)
      |SELECT qlab AS label, COUNT(*) AS n_queries,
      |  CAST(SUM(CASE WHEN qlab = nlab THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |  ROUND(SUM(CASE WHEN qlab = nlab THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
      |    AS acc
      |FROM r GROUP BY 1 ORDER BY label""".stripMargin

  /** Embedding drift between two corpus snapshots (stand-in: even/odd vec_id
    * halves): per-label mean-vector prototypes for each half, their cosine and
    * norms. prototype_cos ≈ 1 means the label's region didn't move between
    * embedding runs; a dip says re-index/re-train. Everything is exploded to
    * (label, half, dim) keyed aggregates — the array never crosses a shuffle,
    * and per-dim/per-term sums go through DECIMAL so both engines see
    * identical doubles regardless of partition order.
    */
  def qEmbedDrift(spark: SparkSession, dir: String): DataFrame = {
    val dec18 = (c: org.apache.spark.sql.Column) => c.cast("decimal(27,12)")
    val e = Tables.embeddings(spark, dir)
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")))
    val m = e.groupBy(col("label"), col("half"), col("pos"))
      .agg((sum(dec18(col("col").cast("double"))).cast("double") /
        count(lit(1))).as("m"))
    val a = m.filter(col("half") === 0)
      .select(col("label"), col("pos"), col("m").as("ma"))
    val b = m.filter(col("half") === 1)
      .select(col("label"), col("pos"), col("m").as("mb"))
    a.join(b, Seq("label", "pos"))
      .groupBy(col("label"))
      .agg(sum(dec18(col("ma") * col("mb"))).cast("double").as("dt"),
        sum(dec18(col("ma") * col("ma"))).cast("double").as("na2"),
        sum(dec18(col("mb") * col("mb"))).cast("double").as("nb2"))
      .select(col("label"),
        round(col("dt") / (sqrt(col("na2")) * sqrt(col("nb2"))), 6)
          .as("prototype_cos"),
        round(sqrt(col("na2")), 6).as("norm_a"),
        round(sqrt(col("nb2")), 6).as("norm_b"))
      .orderBy(col("label"))
  }

  val embedDriftSql: String =
    """WITH e AS (SELECT label, vec_id % 2 AS half, x.i AS pos,
      |    embedding[x.i]::DOUBLE AS v
      |  FROM embeddings CROSS JOIN
      |    (SELECT unnest(generate_series(1, 64)) AS i) x),
      |m AS (SELECT label, half, pos,
      |    CAST(SUM(CAST(v AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS m
      |  FROM e GROUP BY 1, 2, 3),
      |j AS (SELECT a.label, a.m AS ma, b.m AS mb
      |  FROM m a JOIN m b ON a.label = b.label AND a.pos = b.pos
      |  WHERE a.half = 0 AND b.half = 1),
      |g AS (SELECT label,
      |    CAST(SUM(CAST(ma * mb AS DECIMAL(27,12))) AS DOUBLE) AS dt,
      |    CAST(SUM(CAST(ma * ma AS DECIMAL(27,12))) AS DOUBLE) AS na2,
      |    CAST(SUM(CAST(mb * mb AS DECIMAL(27,12))) AS DOUBLE) AS nb2
      |  FROM j GROUP BY 1)
      |SELECT label, ROUND(dt / (sqrt(na2) * sqrt(nb2)), 6) AS prototype_cos,
      |  ROUND(sqrt(na2), 6) AS norm_a, ROUND(sqrt(nb2), 6) AS norm_b
      |FROM g ORDER BY label""".stripMargin

  def qEmbedQuantize(spark: SparkSession, dir: String): DataFrame =
    Embeddings.quantizeStats(Tables.embeddings(spark, dir), "vec_id", "embedding")
      .orderBy(col("vec_id"))

  val embedQuantizeSql: String =
    """WITH m AS (SELECT vec_id,
      |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx,
      |    embedding FROM embeddings),
      |e AS (SELECT vec_id, mx, unnest(embedding) AS x FROM m),
      |q AS (SELECT vec_id, mx, CASE WHEN mx = 0 THEN 0
      |    ELSE CAST(ROUND(x::DOUBLE * 127.0 / mx) AS BIGINT) END AS qv FROM e)
      |SELECT vec_id, ROUND(mx, 6) AS scale, CAST(SUM(qv) AS BIGINT) AS sum_q,
      |  MIN(qv) AS min_q, MAX(qv) AS max_q
      |FROM q GROUP BY vec_id, mx ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------------------------
  // Funnel + cohort retention (round 3)
  // -------------------------------------------------------------------------

  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    Funnel.funnelCounts(Tables.events(spark, dir), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))

  val funnelSql: String =
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
      |    WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
      |    JOIN s1 ON e.user_id = s1.user_id
      |    WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
      |    JOIN s2 ON e.user_id = s2.user_id
      |    WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM s1) AS n_stage_1,
      |       (SELECT COUNT(*) FROM s2) AS n_stage_2,
      |       (SELECT COUNT(*) FROM s3) AS n_stage_3""".stripMargin

  /** SESSION-scoped funnel: the same strictly-ordered stages, but a
    * conversion must complete within ONE session (30-min gap sessionization) —
    * the composition of [[EventWindows.sessionize]]'s per-event session
    * numbering with [[Funnel.funnelCounts]], via a synthetic
    * (user, session) funnel key. Counts are sessions reaching each stage:
    * the per-session product-analytics view next to [[qFunnel]]'s lifetime
    * view and [[qFunnelWindowed]]'s fixed-window view.
    */
  def qSessionFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSession = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_type"))
      .withColumn("__new",
        when(lag(col("ms"), 1).over(w).isNull or
          col("ms") - lag(col("ms"), 1).over(w) > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .withColumn("skey", col("user_id") * 100000L + col("session_id"))
    Funnel.funnelCounts(withSession, "skey", "ms", "event_type",
      Seq("view", "click", "purchase"))
  }

  val sessionFunnelSql: String =
    """WITH e0 AS (SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
      |f AS (SELECT user_id, ms, event_type,
      |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e0 WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
      |e AS (SELECT user_id * 100000 + CAST(SUM(is_new) OVER (
      |      PARTITION BY user_id ORDER BY ms
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS skey,
      |    ms, event_type FROM f),
      |s1 AS (SELECT skey, MIN(ms) AS t FROM e
      |    WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.skey, MIN(e.ms) AS t FROM e
      |    JOIN s1 ON e.skey = s1.skey
      |    WHERE e.event_type = 'click' AND e.ms >= s1.t GROUP BY 1),
      |s3 AS (SELECT e.skey, MIN(e.ms) AS t FROM e
      |    JOIN s2 ON e.skey = s2.skey
      |    WHERE e.event_type = 'purchase' AND e.ms >= s2.t GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM s1) AS n_stage_1,
      |       (SELECT COUNT(*) FROM s2) AS n_stage_2,
      |       (SELECT COUNT(*) FROM s3) AS n_stage_3""".stripMargin

  /** Windowed funnel: each stage must convert within 24h of the previous one —
    * [[Funnel.funnelCountsWindowed]], the conversion-window refinement of
    * [[qFunnel]].
    */
  def qFunnelWindowed(spark: SparkSession, dir: String): DataFrame =
    Funnel.funnelCountsWindowed(Tables.events(spark, dir), "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), windowMs = 86400000L)

  val funnelWindowedSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |s1 AS (SELECT user_id, MIN(ms) AS t FROM e
      |    WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.ms) AS t FROM e
      |    JOIN s1 ON e.user_id = s1.user_id
      |    WHERE e.event_type = 'click' AND e.ms >= s1.t
      |      AND e.ms <= s1.t + 86400000 GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.ms) AS t FROM e
      |    JOIN s2 ON e.user_id = s2.user_id
      |    WHERE e.event_type = 'purchase' AND e.ms >= s2.t
      |      AND e.ms <= s2.t + 86400000 GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM s1) AS n_stage_1,
      |       (SELECT COUNT(*) FROM s2) AS n_stage_2,
      |       (SELECT COUNT(*) FROM s3) AS n_stage_3""".stripMargin

  def qCohortRetention(spark: SparkSession, dir: String): DataFrame =
    Funnel.cohortRetention(Tables.events(spark, dir), "user_id", "ts")
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))

  val cohortRetentionSql: String =
    """WITH weekly AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |c AS (SELECT user_id, MIN(wk) AS cw FROM weekly GROUP BY 1),
      |j AS (SELECT w.user_id, c.cw, w.wk
      |    FROM weekly w JOIN c ON w.user_id = c.user_id)
      |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
      |  CAST(date_diff('day', cw, wk) / 7 AS BIGINT) AS week_offset,
      |  COUNT(*) AS n_users
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------------
  // Training-data assembly: sequence packing, mixture resampling, repetition
  // signals, incremental ingest dedup
  // -------------------------------------------------------------------------

  /** Concat-and-chunk sequence packing: per source stream (docs in doc_id order),
    * each doc's offset in the concatenated token stream and the 512-token
    * training sequences it occupies ([[Packing.packChunks]]).
    */
  def qSeqPack(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("source"), col("doc_id"),
      TextStats.wsTokenCount(col("text")).as("n_tokens"))
    Packing.packChunks(d, "doc_id", "source", "n_tokens", seqLen = 512)
      .orderBy(col("source"), col("doc_id"))
  }

  val seqPackSql: String =
    """WITH t AS (SELECT source, doc_id,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE length(text) - length(replace(text, ' ', '')) + 1 END
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT source, doc_id, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS tok_start
      |  FROM t),
      |s AS (SELECT source, doc_id, n_tokens, tok_start,
      |    CAST(FLOOR(tok_start / 512.0) AS BIGINT) AS seq_first,
      |    CAST(CASE WHEN n_tokens <= 0 THEN FLOOR(tok_start / 512.0)
      |         ELSE FLOOR((tok_start + n_tokens - 1) / 512.0) END AS BIGINT)
      |      AS seq_last
      |  FROM c)
      |SELECT source, doc_id, n_tokens, tok_start, seq_first, seq_last,
      |  seq_last - seq_first + 1 AS n_seqs
      |FROM s ORDER BY source, doc_id""".stripMargin

  /** Greedy document-boundary packing (no doc split, SFT-style) over the same
    * per-source streams as [[qSeqPack]] ([[Packing.packGreedy]]). The oracle
    * replays the sequential fold as a recursive CTE stepping one doc per
    * source per iteration.
    */
  def qSeqPackGreedy(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("source"), col("doc_id"),
      TextStats.wsTokenCount(col("text")).as("n_tokens"))
    Packing.packGreedy(d, "doc_id", "source", "n_tokens", seqLen = 512)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Recursive-CTE replay of the greedy fold, ending in
    * `rec(source, rn, doc_id, n_tokens, seq_id, acc)` — shared by the
    * per-doc and per-source-stats oracles.
    */
  private val greedyRecCtesSql: String =
    """WITH RECURSIVE t AS (SELECT source, doc_id,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE length(text) - length(replace(text, ' ', '')) + 1 END
      |      AS BIGINT) AS n_tokens,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents),
      |rec AS (
      |  SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS seq_id,
      |    n_tokens AS acc
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.source, t.rn, t.doc_id, t.n_tokens,
      |    CASE WHEN rec.acc + t.n_tokens > 512 THEN rec.seq_id + 1
      |         ELSE rec.seq_id END,
      |    CASE WHEN rec.acc + t.n_tokens > 512 THEN t.n_tokens
      |         ELSE rec.acc + t.n_tokens END
      |  FROM rec JOIN t ON t.source = rec.source AND t.rn = rec.rn + 1)""".stripMargin

  val seqPackGreedySql: String =
    s"""$greedyRecCtesSql
      |SELECT source, doc_id, n_tokens, seq_id FROM rec
      |ORDER BY source, doc_id""".stripMargin

  /** Packing efficiency monitor: per source, how many greedy sequences the
    * stream packs into and how full they are — fill rate is THE number a
    * training-data engineer watches when choosing seqLen (waste =
    * n_seqs·seqLen − total tokens, counting oversize docs' overflow as its own
    * sequence's fill). Pure aggregation over [[Packing.packGreedy]]'s output.
    */
  def qPackStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("source"), col("doc_id"),
      TextStats.wsTokenCount(col("text")).as("n_tokens"))
    Packing.packGreedy(d, "doc_id", "source", "n_tokens", seqLen = 512)
      .groupBy(col("source"))
      .agg(
        (max(col("seq_id")) + 1).as("n_seqs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(sum(col("n_tokens")).cast("double")
          / ((max(col("seq_id")) + 1) * 512), 6).as("fill_rate"))
      .orderBy(col("source"))
  }

  val packStatsSql: String =
    s"""$greedyRecCtesSql
      |SELECT source, MAX(seq_id) + 1 AS n_seqs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  ROUND(SUM(n_tokens) * 1.0 / ((MAX(seq_id) + 1) * 512), 6) AS fill_rate
      |FROM rec GROUP BY source ORDER BY source""".stripMargin

  /** One-pass column profiling of the documents table
    * ([[Profiling.profileColumns]]) — the data-quality gate a pipeline runs on
    * every new drop.
    */
  def qProfileDocs(spark: SparkSession, dir: String): DataFrame =
    Profiling.profileColumns(Tables.documents(spark, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      .orderBy(col("column_name"))

  val profileDocsSql: String = {
    val perCol = Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT($c) AS n_nulls, COUNT(DISTINCT $c) AS n_distinct,
        |  CAST(MIN($c) AS VARCHAR) AS min_value,
        |  CAST(MAX($c) AS VARCHAR) AS max_value
        |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$perCol\nORDER BY column_name"
  }

  /** Equi-depth histogram of lineitem prices ([[GlobalRank.equiDepthHistogram]]):
    * 8 equal-count buckets cut on a distributed global row number — NO
    * single-task `ROW_NUMBER() OVER (ORDER BY ...)` window anywhere in the plan
    * (the oracle uses one; at sf it's equivalent, at 100 TB only ours runs).
    */
  def qEquidepthPrice(spark: SparkSession, dir: String): DataFrame =
    GlobalRank.equiDepthHistogram(Tables.lineitem(spark, dir),
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"), buckets = 8)
      .orderBy(col("bucket"))

  val equidepthPriceSql: String =
    """WITH r AS (SELECT l_extendedprice AS v,
      |    ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM lineitem)
      |SELECT (rn - 1) * 8 // n AS bucket, COUNT(*) AS n_rows,
      |  MIN(v) AS min_value, MAX(v) AS max_value
      |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin

  /** One-pass pairwise Pearson correlation over lineitem's numeric columns
    * ([[Profiling.corrMatrix]]) — column-relationship profiling in a single
    * map-side-partial aggregate.
    */
  def qNumericCorr(spark: SparkSession, dir: String): DataFrame =
    Profiling.corrMatrix(Tables.lineitem(spark, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .select(col("col_a"), col("col_b"), round(col("pearson_r"), 6).as("pearson_r"))
      .orderBy(col("col_a"), col("col_b"))

  val numericCorrSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
        |  ROUND(corr($a, $b), 6) AS pearson_r FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
  }

  /** C4-style span-level exact dedup with document reassembly
    * ([[SpanDedup.spanDedup]]): drop every 10-word span already seen in an
    * earlier doc, rebuild documents from surviving spans.
    */
  def qSpanDedup(spark: SparkSession, dir: String): DataFrame =
    SpanDedup.spanDedup(Tables.documents(spark, dir), "doc_id", "text",
        spanWords = 10)
      .orderBy(col("doc_id"))

  val spanDedupSql: String =
    """WITH w AS (
      |  SELECT doc_id, u.pos AS pos, u.word AS word
      |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(l)),
      |          i -> {'pos': i-1, 'word': l[i]})) AS u
      |        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
      |),
      |sp AS (SELECT doc_id, pos // 10 AS span_id,
      |    string_agg(word, ' ' ORDER BY pos) AS span_text
      |  FROM w GROUP BY 1, 2),
      |fst AS (SELECT span_text, MIN(ROW(doc_id, span_id)) AS f FROM sp GROUP BY 1),
      |kept AS (SELECT sp.* FROM sp JOIN fst USING (span_text)
      |  WHERE ROW(doc_id, span_id) = f),
      |tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM sp GROUP BY 1),
      |ka AS (SELECT doc_id, COUNT(*) AS n_kept,
      |    string_agg(span_text, ' ' ORDER BY span_id) AS text_deduped
      |  FROM kept GROUP BY 1)
      |SELECT tot.doc_id, n_spans, COALESCE(n_kept, 0) AS n_kept,
      |  COALESCE(text_deduped, '') AS text_deduped
      |FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id
      |ORDER BY tot.doc_id""".stripMargin

  /** SCD-type-2 history build over the event stream ([[Runs.collapseRuns]]):
    * per user, collapse consecutive same-event_type events into validity
    * intervals with the next run's start as the exclusive upper bound.
    */
  def qScd2Runs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"),
      unix_millis(col("ts")).as("ms"), col("event_id"), col("event_type"))
    Runs.collapseRuns(e, "user_id", "ms", "event_id", "event_type")
      .orderBy(col("user_id"), col("run_id"))
  }

  val scd2RunsSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
      |f AS (SELECT user_id, ms, event_id, event_type,
      |    CASE WHEN ROW_NUMBER() OVER w = 1
      |           OR event_type IS DISTINCT FROM lag(event_type) OVER w
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      |r AS (SELECT user_id, event_type, ms,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
      |  FROM f),
      |c AS (SELECT user_id, run_id, MAX(event_type) AS value, MIN(ms) AS valid_from,
      |    MAX(ms) AS valid_to, COUNT(*) AS n_events
      |  FROM r GROUP BY 1, 2)
      |SELECT user_id, run_id, value, valid_from, valid_to,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_until,
      |  n_events
      |FROM c ORDER BY user_id, run_id""".stripMargin

  /** Shared oracle CTEs for the clustering queries: per-vector norms, seed
    * centroids (vec_id < 8 — deterministic, engine-portable), all-centroid
    * cosines, and the rank-1 assignment.
    */
  private[graft] val centroidAssignCtes =
    """v AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nv
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cid, embedding AS ce, nv AS nc FROM v WHERE vec_id < 8),
      |s AS (SELECT v.vec_id, c.cid,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> v.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)) / (v.nv * c.nc) AS cos
      |  FROM v CROSS JOIN c),
      |r AS (SELECT vec_id, cid, cos,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk FROM s)""".stripMargin

  /** Deterministic seed centroids for the clustering oracle queries: the 8
    * lowest-id embedding rows (the oracle SQL embeds the same `vec_id < 8`).
    */
  private[graft] def seedCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  /** Nearest-centroid assignment ([[Clustering.assignToCentroids]]) — the
    * deterministic half of k-means, oracle-checked against a rank-1 window over
    * all (vector, centroid) cosines.
    */
  def qCentroidAssign(spark: SparkSession, dir: String): DataFrame =
    Clustering.assignToCentroids(Tables.embeddings(spark, dir), "vec_id",
        "embedding", seedCentroids(spark, dir), "cid", "cvec")
      .select(col("vec_id"), col("centroid_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_id"))

  val centroidAssignSql: String =
    s"""WITH $centroidAssignCtes
      |SELECT vec_id, cid AS centroid_id, ROUND(cos, 6) AS cosine
      |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin

  /** SemDeDup-style semantic near-dup pairs ([[Clustering.centroidDupPairs]]):
    * centroid blocking bounds the quadratic term to cluster size; exact cosine
    * within blocks.
    */
  def qSemanticDup(spark: SparkSession, dir: String): DataFrame =
    Clustering.centroidDupPairs(Tables.embeddings(spark, dir), "vec_id",
        "embedding", seedCentroids(spark, dir), "cid", "cvec", threshold = 0.2)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("id_a"), col("id_b"))

  val semanticDupSql: String =
    s"""WITH $centroidAssignCtes,
      |asn AS (SELECT vec_id, cid FROM r WHERE rk = 1),
      |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> vx.embedding[i]::DOUBLE * vy.embedding[i]::DOUBLE)) / (vx.nv * vy.nv) AS cosine
      |  FROM asn x JOIN asn y ON x.cid = y.cid AND x.vec_id < y.vec_id
      |  JOIN v vx ON x.vec_id = vx.vec_id JOIN v vy ON y.vec_id = vy.vec_id)
      |SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM p
      |WHERE cosine >= 0.2 ORDER BY id_a, id_b""".stripMargin

  /** Per-source unigram KL divergence from the corpus blend
    * ([[TextStats.groupDivergence]]) — the drift diagnostic behind mixture
    * rebalancing decisions.
    */
  def qSourceKl(spark: SparkSession, dir: String): DataFrame =
    TextStats.groupDivergence(Tables.documents(spark, dir), "source", "text")
      .orderBy(col("source"))

  val sourceKlSql: String =
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
      |gt AS (SELECT source, t, COUNT(*) AS n_gt FROM tok GROUP BY 1, 2),
      |g AS (SELECT source, CAST(SUM(n_gt) AS BIGINT) AS n_g FROM gt GROUP BY 1),
      |ct AS (SELECT t, CAST(SUM(n_gt) AS BIGINT) AS n_t FROM gt GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM ct),
      |k AS (SELECT gt.source,
      |    CAST((n_gt * 1.0 / n_g) * ln((n_gt * 1.0 / n_g) / (n_t * 1.0 / n_total))
      |      AS DECIMAL(18,8)) AS term_kl
      |  FROM gt JOIN ct USING (t) JOIN g USING (source) CROSS JOIN tot)
      |SELECT k.source, MAX(g.n_g) AS n_tokens,
      |  ROUND(CAST(SUM(term_kl) AS DOUBLE) / 0.6931471805599453, 6) AS kl_bits
      |FROM k JOIN g ON k.source = g.source
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Feature-store point-in-time join: every order picks up the user state
    * that was valid AT order time — the composition of [[Runs.collapseRuns]]
    * (SCD2 dimension from the event log) with [[AsOfJoin.asOf]] (as-of ON the
    * run's valid_from; runs tile each key's timeline, so as-of ≡ interval
    * containment — the oracle states it as BETWEEN-style containment and the
    * hash compare proves the equivalence). Orders before a user's first event,
    * or for users with no events, get null state — exactly what a leakage-safe
    * training-feature join must do (no future peeking).
    */
  def qPitJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"),
      unix_millis(col("ts")).as("ms"), col("event_id"), col("event_type"))
    val dim = Runs.collapseRuns(e, "user_id", "ms", "event_id", "event_type")
      .select(col("user_id"), col("run_id"), col("value"), col("valid_from"))
    val facts = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), (unix_timestamp(col("o_orderdate")) * 1000).as("oms"))
    AsOfJoin.asOf(facts, dim, "o_custkey", "user_id", "oms", "valid_from",
        Seq("run_id", "value"))
      .select(col("o_orderkey"), col("o_custkey"), col("oms"),
        col("run_id"), col("value"))
      .orderBy(col("o_orderkey"))
  }

  /** The scd2 runs CTEs of [[scd2RunsSql]], reusable: yields `runs`
    * (user_id, run_id, value, valid_from, valid_until).
    */
  private val scd2RunsCtes =
    """e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
      |f AS (SELECT user_id, ms, event_id, event_type,
      |    CASE WHEN ROW_NUMBER() OVER w = 1
      |           OR event_type IS DISTINCT FROM lag(event_type) OVER w
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      |r AS (SELECT user_id, event_type, ms,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
      |  FROM f),
      |c AS (SELECT user_id, run_id, MAX(event_type) AS value, MIN(ms) AS valid_from
      |  FROM r GROUP BY 1, 2),
      |runs AS (SELECT user_id, run_id, value, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_until
      |  FROM c)""".stripMargin

  val pitJoinSql: String =
    s"""WITH $scd2RunsCtes
      |SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS oms,
      |  runs.run_id, runs.value
      |FROM orders LEFT JOIN runs ON o_custkey = runs.user_id
      |  AND runs.valid_from <= epoch_ms(o_orderdate)
      |  AND (runs.valid_until IS NULL OR epoch_ms(o_orderdate) < runs.valid_until)
      |ORDER BY o_orderkey""".stripMargin

  /** Hybrid retrieval with reciprocal-rank fusion: a dense leg (embedding
    * cosine to query vector 0) and a sparse leg (distinct-term overlap with
    * query document 0) each produce a top-100 candidate ranking, fused as
    * `Σ 1/(60 + rank)` (RRF, Cormack et al.) and cut to the final top 20.
    *
    * Scale shape: each leg is scan → TakeOrderedAndProject(100) — the rank
    * window then runs on ≤100 rows post-limit (the [[TextQuality.topNgrams]]
    * precedent), never on the corpus. The fusion join touches 100-row inputs.
    */
  def qHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val docs = Tables.documents(spark, dir)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), SimSearch.norm(col("embedding")).as("qn"))
    val dense = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("id"),
        (SimSearch.dot(col("embedding"), col("qe")) /
          (SimSearch.norm(col("embedding")) * col("qn"))).as("cos"))
      .orderBy(col("cos").desc, col("id")).limit(100)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("id"))).cast("long"))
    val qTerms = docs.filter(col("doc_id") === 0)
      .select(explode(array_distinct(split(col("text"), " "))).as("term"))
    val sparse = docs.filter(col("doc_id") =!= 0)
      .select(col("doc_id").as("id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .join(broadcast(qTerms), "term")
      .groupBy(col("id")).agg(count(lit(1)).as("overlap"))
      .orderBy(col("overlap").desc, col("id")).limit(100)
      .withColumn("sparse_rank",
        row_number().over(Window.orderBy(col("overlap").desc, col("id"))).cast("long"))
    dense.select(col("id"), col("dense_rank"))
      .join(sparse.select(col("id"), col("sparse_rank")), Seq("id"), "full_outer")
      .select(col("id"), col("dense_rank"), col("sparse_rank"),
        round(
          coalesce(lit(1.0) / (lit(60) + col("dense_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("sparse_rank")), lit(0.0)), 6)
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id")).limit(20)
  }

  val hybridRrfSql: String =
    """WITH qv AS (SELECT embedding AS qe,
      |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS qn
      |  FROM embeddings WHERE vec_id = 0),
      |dense0 AS (SELECT vec_id AS id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> e.embedding[i]::DOUBLE * qv.qe[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) * qv.qn) AS cos
      |  FROM embeddings e CROSS JOIN qv WHERE vec_id <> 0),
      |dense AS (SELECT id, ROW_NUMBER() OVER (ORDER BY cos DESC, id) AS dense_rank
      |  FROM dense0 QUALIFY dense_rank <= 100),
      |qt AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE doc_id = 0),
      |ov AS (SELECT doc_id AS id, COUNT(*) AS overlap
      |  FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents WHERE doc_id <> 0) d
      |  JOIN qt USING (term) GROUP BY 1),
      |sparse AS (SELECT id, ROW_NUMBER() OVER (ORDER BY overlap DESC, id) AS sparse_rank
      |  FROM ov QUALIFY sparse_rank <= 100),
      |fused AS (SELECT COALESCE(dense.id, sparse.id) AS id, dense_rank, sparse_rank,
      |    ROUND(COALESCE(1.0::DOUBLE / (60 + dense_rank), 0) +
      |          COALESCE(1.0::DOUBLE / (60 + sparse_rank), 0), 6) AS rrf_score
      |  FROM dense FULL OUTER JOIN sparse ON dense.id = sparse.id)
      |SELECT id, dense_rank, sparse_rank, rrf_score FROM fused
      |ORDER BY rrf_score DESC, id LIMIT 20""".stripMargin

  /** Exact distributed quantiles of lineitem prices
    * ([[GlobalRank.exactQuantiles]]): percentile_disc values at p50/p90/p99
    * picked by global rank — the zero-error partner of
    * `q_quality_quantiles`'s sketch, still with no single-task sort.
    */
  def qExactQuantiles(spark: SparkSession, dir: String): DataFrame =
    GlobalRank.exactQuantiles(Tables.lineitem(spark, dir), "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"), probs = Seq(0.5, 0.9, 0.99))
      .select(col("p"), col("value"))
      .orderBy(col("p"))

  val exactQuantilesSql: String =
    """WITH r AS (SELECT l_extendedprice AS v,
      |    ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM lineitem)
      |SELECT CAST(p AS DOUBLE) AS p, v AS value
      |FROM r JOIN (VALUES (0.5), (0.9), (0.99)) t(p)
      |  ON rn = GREATEST(1, CAST(ceil(CAST(p AS DOUBLE) * n) AS BIGINT))
      |ORDER BY p""".stripMargin

  /** Top-20 PMI collocations over the corpus ([[TextStats.collocations]]) —
    * the phrase-mining signal behind wordpiece-style vocabulary induction.
    */
  def qCollocations(spark: SparkSession, dir: String): DataFrame =
    TextStats.collocations(Tables.documents(spark, dir), "text",
      k = 20, minCount = 5L)

  val collocationsSql: String =
    """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
      |bg0 AS (SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
      |    i -> {'w1': w[i], 'w2': w[i+1]})) AS b FROM w),
      |bg AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS n_pair FROM bg0 GROUP BY 1, 2),
      |uc AS (SELECT t, COUNT(*) AS n_tok
      |  FROM (SELECT unnest(w) AS t FROM w) GROUP BY 1),
      |tp AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS t_pairs FROM bg),
      |tt AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS t_toks FROM uc)
      |SELECT w1 || ' ' || w2 AS bigram, n_pair,
      |  ROUND(ln(n_pair * 1.0 * t_toks * t_toks / (t_pairs * 1.0 * n_a * n_b)), 6) AS pmi
      |FROM bg
      |JOIN (SELECT t AS w1, n_tok AS n_a FROM uc) a USING (w1)
      |JOIN (SELECT t AS w2, n_tok AS n_b FROM uc) b USING (w2)
      |CROSS JOIN tp CROSS JOIN tt
      |WHERE n_pair >= 5
      |ORDER BY pmi DESC, bigram LIMIT 20""".stripMargin

  /** Temporal leave-one-out evaluation split over the event log
    * ([[Splits.leaveOneOutSplit]]): each user's last event is the test point.
    * Reported as per-split totals (the assignment itself is row-level).
    */
  def qLooSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"),
      unix_millis(col("ts")).as("ms"), col("event_id"))
    Splits.leaveOneOutSplit(e, "user_id", "ms", "event_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("split"))
  }

  val looSplitSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) = 1
      |      THEN 'test' ELSE 'train' END AS split
      |  FROM events)
      |SELECT split, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  /** Relative-standing windows: per-brand percent_rank + cume_dist of part
    * price — completes the window-function family (row_number / rank-1 / NTILE
    * / lag / lead / running sum are covered elsewhere). `partitionBy(brand)`,
    * parallel across brands, no global window; the full order (price, partkey)
    * makes both engines rank identically.
    */
  def qPricePctRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The ordering is TOTAL (price, partkey), so percent_rank = (rn−1)/
    // (n−1) and cume_dist = rn/n with rn = row_number. The built-ins
    // compute those as doubles, and at sf1.0 partition sizes (n−1 = 6400)
    // values like 410/6400 = 0.0640625 sit exactly on the 6-dp round
    // boundary, where the engines' division ulps pick opposite sides (the
    // sf1.0 value-hash gate caught 3 such rows). Round in exact integer
    // space instead: half-up of k/d at 6 dp is (2k·10⁶ + d) div 2d, and
    // the final /1e6 is a single exact-operand IEEE division both
    // engines perform identically.
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    val nw = Window.partitionBy(col("p_brand"))
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        (row_number().over(w) - 1).cast("long").as("__k"),
        count(lit(1)).over(nw).as("__n"))
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        when(col("__n") === 1, lit(0.0)).otherwise(
          expr("(2 * __k * 1000000 + (__n - 1)) div (2 * (__n - 1))")
            .cast("double") / 1e6).as("pct_rank"),
        (expr("(2 * (__k + 1) * 1000000 + __n) div (2 * __n)")
          .cast("double") / 1e6).as("cume"))
      .orderBy(col("p_partkey"))
  }

  val pricePctRankSql: String =
    """WITH r AS (SELECT p_partkey, p_brand, p_retailprice,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY p_retailprice, p_partkey) - 1 AS k,
      |    COUNT(*) OVER (PARTITION BY p_brand) AS n
      |  FROM part)
      |SELECT p_partkey, p_brand, p_retailprice,
      |  CASE WHEN n = 1 THEN CAST(0.0 AS DOUBLE) ELSE
      |    CAST((2 * k * 1000000 + (n - 1)) // (2 * (n - 1)) AS DOUBLE)
      |      / 1e6 END AS pct_rank,
      |  CAST((2 * (k + 1) * 1000000 + n) // (2 * n) AS DOUBLE) / 1e6
      |    AS cume
      |FROM r
      |ORDER BY p_partkey""".stripMargin

  /** Join-key skew diagnostic — the report that decides whether a join needs
    * salting BEFORE it runs: per-key frequency profile of lineitem's part key
    * (key count, max/avg per key, the hottest key's share, how many keys run
    * hot). Two aggregations; the per-key table partial-aggregates map-side.
    */
  def qSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    val stats = perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("total_rows"),
      max(col("n")).as("max_per_key"),
      avg(col("n")).as("__avg"))
    val hot = perKey
      .crossJoin(broadcast(stats.select(col("__avg"))))
      .filter(col("n") > col("__avg") * 2)
      .agg(count(lit(1)).as("n_hot_keys"))
    stats.crossJoin(broadcast(hot))
      .select(col("n_keys"), col("total_rows"), col("max_per_key"),
        round(col("__avg"), 6).as("avg_per_key"),
        round(col("max_per_key").cast("double") / col("total_rows"), 6)
          .as("top1_share"),
        col("n_hot_keys"))
  }

  val skewReportSql: String =
    """WITH k AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |s AS (SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS total_rows,
      |    CAST(MAX(n) AS BIGINT) AS max_per_key,
      |    ROUND(AVG(n * 1.0), 6) AS avg_per_key,
      |    MAX(n) * 1.0 / SUM(n) AS t1, AVG(n * 1.0) AS av FROM k)
      |SELECT n_keys, total_rows, max_per_key, avg_per_key,
      |  ROUND(t1, 6) AS top1_share,
      |  (SELECT COUNT(*) FROM k, s WHERE n > av * 2) AS n_hot_keys
      |FROM s""".stripMargin

  /** Gap-free hourly series: a calendar spine from `sequence(min, max, 1h)`
    * left-joins the hourly counts so missing hours surface as explicit zeros —
    * the densification a downstream time-series model needs. The spine explodes
    * from a 1-row min/max aggregate (no driver-side range building).
    */
  def qEventHourlyDense(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
    val spine = Tables.events(spark, dir)
      .agg(unix_timestamp(date_trunc("hour", min(col("ts")))).as("lo"),
        unix_timestamp(date_trunc("hour", max(col("ts")))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_start"))
    spine.join(hourly, Seq("hour_start"), "left")
      .select(col("hour_start"), coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("hour_start"))
  }

  val eventHourlyDenseSql: String =
    """WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
      |    COUNT(*) AS n_events FROM events GROUP BY 1),
      |b AS (SELECT CAST(epoch(date_trunc('hour', MIN(ts))) AS BIGINT) AS lo,
      |    CAST(epoch(date_trunc('hour', MAX(ts))) AS BIGINT) AS hi FROM events),
      |sp AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_start FROM b)
      |SELECT sp.hour_start, COALESCE(h.n_events, 0) AS n_events
      |FROM sp LEFT JOIN h ON sp.hour_start = h.hour_start
      |ORDER BY sp.hour_start""".stripMargin

  /** Market-basket analysis: co-purchased part pairs ranked by lift
    * (`P(ab) / (P(a)·P(b))` over orders) with a support floor — the
    * "frequently bought together" surface. The within-order self-join is
    * bounded by basket size (≤ items-per-order choose 2 — whale baskets cap
    * via a per-order item limit if a corpus has them); counts partial-aggregate
    * map-side; the cut is TakeOrderedAndProject.
    */
  def qMarketBasket(spark: SparkSession, dir: String): DataFrame = {
    // basket form: one order-keyed set aggregate feeds pair generation, item
    // frequencies AND the order count — checkpointed because three branches
    // of one aggregate would otherwise each re-run it (the plan-shape trap)
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .groupBy(col("okey")).agg(collect_set(col("item")).as("items"))
      .localCheckpoint(eager = true)
    val pairs = baskets
      .select(explode(col("items")).as("item_a"), col("items"))
      .select(col("item_a"), explode(col("items")).as("item_b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_ab"))
    val itemN = baskets.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_i"))
    val total = baskets.agg(count(lit(1)).as("n_orders"))
    pairs
      .filter(col("n_ab") >= 3)
      .join(itemN.select(col("item").as("item_a"), col("n_i").as("n_a")), "item_a")
      .join(itemN.select(col("item").as("item_b"), col("n_i").as("n_b")), "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(20)
  }

  val marketBasketSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem),
      |p AS (SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_ab
      |  FROM li a JOIN li b ON a.okey = b.okey AND a.item < b.item GROUP BY 1, 2),
      |i AS (SELECT item, COUNT(*) AS n_i FROM li GROUP BY 1),
      |t AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM li)
      |SELECT item_a, item_b, n_ab,
      |  ROUND(n_ab * 1.0 * n_orders / (n_a * 1.0 * n_b), 6) AS lift
      |FROM p
      |JOIN (SELECT item AS item_a, n_i AS n_a FROM i) a USING (item_a)
      |JOIN (SELECT item AS item_b, n_i AS n_b FROM i) b USING (item_b)
      |CROSS JOIN t
      |WHERE n_ab >= 3
      |ORDER BY lift DESC, item_a, item_b LIMIT 20""".stripMargin

  /** Weighted sample of documents ∝ length ([[Splits.weightedSample]],
    * Efraimidis-Spirakis priorities from md5-derived uniforms — reproducible
    * across runs AND engines; the oracle replays the same priority draw).
    */
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame =
    Splits.weightedSample(
        Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", n = 100)
      .orderBy(col("doc_id"))

  val weightedSampleSql: String =
    """WITH pri AS (SELECT doc_id, n_chars,
      |    pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
      |          / 4294967296.0,
      |        1.0 / n_chars) AS p
      |  FROM documents),
      |top AS (SELECT doc_id, n_chars FROM pri ORDER BY p DESC, doc_id LIMIT 100)
      |SELECT doc_id, n_chars FROM top ORDER BY doc_id""".stripMargin

  /** Jackknife error bars for a corpus-level metric (mean document length):
    * 10 deterministic md5 folds, leave-one-fold-out means, jackknife variance
    * `(k-1)/k · Σ (m_i − m̄)²`. Per-fold sums are exact integers and both
    * double reductions (m̄ and the squared deviations) run through
    * DECIMAL(28,12) accumulators — order-independent, engine-identical. This
    * is how a pipeline attaches uncertainty to any quality metric at scale:
    * two aggregations, no resampling passes.
    */
  def qFoldVariance(spark: SparkSession, dir: String): DataFrame = {
    val folds = Tables.documents(spark, dir)
      .select(col("n_chars"), (Splits.hashBucket(col("doc_id")) % 10).as("fold"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_f"), sum(col("n_chars")).as("s_f"))
    val tot = folds.agg(sum(col("n_f")).as("n"), sum(col("s_f")).as("s"))
    val loo = folds.crossJoin(broadcast(tot))
      .select(((col("s") - col("s_f")).cast("double") /
        (col("n") - col("n_f"))).as("m_i"), col("n"), col("s"))
    val mbar = loo
      .agg(first(col("n")).as("n"), first(col("s")).as("s"),
        count(lit(1)).as("k"),
        sum(col("m_i").cast("decimal(28,12)")).as("sm"))
      .select(col("n"), col("s"), col("k"),
        (col("sm").cast("double") / col("k")).as("mbar"))
    loo.crossJoin(broadcast(mbar.select(col("k"), col("mbar"))))
      .agg(
        round((first(col("s")).cast("double") / first(col("n"))), 6).as("mean"),
        round(sqrt(
          (first(col("k")) - 1).cast("double") / first(col("k")) *
            sum(((col("m_i") - col("mbar")) * (col("m_i") - col("mbar")))
              .cast("decimal(28,12)")).cast("double")), 6).as("jk_se"))
  }

  val foldVarianceSql: String =
    """WITH f AS (SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 100) % 10 AS fold,
      |    COUNT(*) AS n_f, CAST(SUM(n_chars) AS BIGINT) AS s_f
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_f) AS BIGINT) AS n, CAST(SUM(s_f) AS BIGINT) AS s FROM f),
      |loo AS (SELECT (s - s_f) * 1.0 / (n - n_f) AS m_i, n, s FROM f CROSS JOIN t),
      |mb AS (SELECT COUNT(*) AS k,
      |    CAST(SUM(CAST(m_i AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mbar
      |  FROM loo)
      |SELECT ROUND(loo.s * 1.0 / loo.n, 6) AS mean,
      |  ROUND(sqrt((k - 1) * 1.0 / k *
      |    CAST(SUM(CAST((m_i - mbar) * (m_i - mbar) AS DECIMAL(28,12))) AS DOUBLE)), 6)
      |    AS jk_se
      |FROM loo CROSS JOIN mb GROUP BY loo.n, loo.s, k""".stripMargin

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current) — the statistic behind next-action
    * prediction baselines and funnel-shape sanity checks. One per-user lag
    * window (ordered by time, tie on event id) + a (from, to)-keyed aggregate;
    * row-normalized by the per-from totals.
    */
  def qTransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = steps.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    steps.join(fromTotals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val transitionMatrixSql: String =
    """WITH s AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM s
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |f AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
      |SELECT c.from_type, to_type, n, ROUND(n * 1.0 / n_from, 6) AS p
      |FROM c JOIN f ON c.from_type = f.from_type
      |ORDER BY c.from_type, to_type""".stripMargin

  /** Exponentially time-decayed popularity: each order contributes
    * `exp(−Δdays/30)` against the corpus's latest order date — the freshness-
    * weighted ranking signal (a trending-items surface). The decay anchor is
    * the max order date (data-derived, so the query is reproducible at any
    * time); per-item decayed weights sum through DECIMAL(28,12) accumulators
    * (order-independent; each exp term is engine-identical double arithmetic
    * on exact integer day deltas).
    */
  def qDecayedPopularity(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), (unix_timestamp(col("o_orderdate")) / 86400L)
        .cast("long").as("day"))
    val anchor = o.agg(max(col("day")).as("max_day"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .crossJoin(broadcast(anchor))
      .select(col("l_partkey"),
        exp((col("day") - col("max_day")).cast("double") / 30.0)
          .cast("decimal(28,12)").as("w"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("w")).cast("double"), 6).as("decayed_pop"))
      .orderBy(col("decayed_pop").desc, col("l_partkey"))
      .limit(20)
  }

  val decayedPopularitySql: String =
    """WITH o AS (SELECT o_orderkey,
      |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day FROM orders),
      |a AS (SELECT MAX(day) AS max_day FROM o),
      |w AS (SELECT l_partkey,
      |    CAST(exp((day - max_day) * 1.0 / 30.0) AS DECIMAL(28,12)) AS w
      |  FROM lineitem JOIN o ON l_orderkey = o_orderkey CROSS JOIN a),
      |g AS (SELECT l_partkey, COUNT(*) AS n_lines,
      |    ROUND(CAST(SUM(w) AS DOUBLE), 6) AS decayed_pop FROM w GROUP BY 1)
      |SELECT l_partkey, n_lines, decayed_pop FROM g
      |ORDER BY decayed_pop DESC, l_partkey LIMIT 20""".stripMargin

  /** Rolling 7-day event volume via a RANGE window frame (`RANGE BETWEEN 6
    * PRECEDING AND CURRENT ROW` over per-day aggregates) — the frame variant
    * the window family still lacked. The window runs over the per-(type, day)
    * aggregate (≤ types × days rows), partitioned by type — never over raw
    * events.
    */
  def qRolling7d(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L).cast("long").as("day"))
      .agg(count(lit(1)).as("n_day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-6, Window.currentRow)
    daily
      .select(col("event_type"), col("day"), col("n_day"),
        sum(col("n_day")).over(w).as("n_7d"))
      .orderBy(col("event_type"), col("day"))
  }

  val rolling7dSql: String =
    """WITH d AS (SELECT event_type,
      |    CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS day,
      |    COUNT(*) AS n_day
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n_day,
      |  CAST(SUM(n_day) OVER (PARTITION BY event_type ORDER BY day
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
      |FROM d ORDER BY event_type, day""".stripMargin

  /** PageRank over the co-purchase graph ([[PageRank.pageRank]], 5 damped
    * iterations): structural item importance beyond raw counts. Edges =
    * part pairs co-purchased in ≥2 orders, symmetrized. The oracle unrolls
    * the SAME 5 iterations as chained CTEs with identical DECIMAL contribution
    * sums and double scalar arithmetic — every rank matches to 6 decimals.
    */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    // basket form: one order-keyed set aggregate + map-side pair generation
    // (bounded by basket size²) instead of a two-sided self-join shuffle
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .groupBy(col("okey")).agg(collect_set(col("item")).as("items"))
      .select(explode(col("items")).as("ia"), col("items"))
      .select(col("ia"), explode(col("items")).as("ib"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    // both edge directions from ONE generator — a union of two projections
    // of `pairs` re-runs the whole basket pipeline per branch (column
    // pruning specializes each branch's partial aggregate, so the exchange
    // is NOT shared; the q_dedup_lsh banding trap)
    val edges = pairs.select(explode(array(
        struct(col("ia").as("src"), col("ib").as("dst")),
        struct(col("ib").as("src"), col("ia").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    PageRank.pageRank(edges, "src", "dst", iterations = 5, damping = 0.85)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("node"))
  }

  val pagerankSql: String = {
    val iters = (1 to 5).map { i =>
      s"""pr$i AS (SELECT nodes.node,
        |    (1.0::DOUBLE - 0.85::DOUBLE) / n
        |      + 0.85::DOUBLE * COALESCE(CAST(s AS DOUBLE), 0.0::DOUBLE) AS pr
        |  FROM nodes CROSS JOIN cnt LEFT JOIN (
        |    SELECT e.dst AS node,
        |      SUM(CAST(pr${i - 1}.pr / deg.deg AS DECIMAL(28,15))) AS s
        |    FROM e JOIN pr${i - 1} ON e.src = pr${i - 1}.node
        |    JOIN deg ON e.src = deg.src GROUP BY 1) c
        |  ON nodes.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem),
      |p AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS n_ab
      |  FROM li a JOIN li b ON a.okey = b.okey AND a.item < b.item
      |  GROUP BY 1, 2),
      |e AS (SELECT ia AS src, ib AS dst FROM p WHERE n_ab >= 2
      |  UNION ALL SELECT ib, ia FROM p WHERE n_ab >= 2),
      |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS node
      |  FROM (SELECT src FROM e UNION ALL SELECT dst FROM e) t(src)),
      |cnt AS (SELECT COUNT(*) AS n FROM nodes),
      |pr0 AS (SELECT node, 1.0::DOUBLE / n AS pr FROM nodes CROSS JOIN cnt),
      |$iters
      |SELECT node, ROUND(pr, 6) AS pr FROM pr5 ORDER BY node""".stripMargin
  }

  /** Month-over-month customer churn from the order log: for every month,
    * how many of the previous month's active customers did not come back.
    * Distinct (customer, month) activity (≪ orders), one self-join on
    * (customer, month+1), per-month aggregates — no windows over users.
    */
  def qChurn(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .distinct()
    val nxt = act.select(col("cust"), (col("m") - 1).as("m"))
    val retained = act.join(nxt, Seq("cust", "m"))
      .groupBy(col("m")).agg(count(lit(1)).as("n_retained"))
    val monthly = act.groupBy(col("m")).agg(count(lit(1)).as("n_active"))
    val lastMonth = act.agg(max(col("m")).as("mx"))
    monthly.join(retained, Seq("m"), "left")
      .crossJoin(broadcast(lastMonth))
      .filter(col("m") < col("mx")) // the final month has no successor to churn into
      .select(col("m"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        (col("n_active") - coalesce(col("n_retained"), lit(0L))).as("n_churned"),
        round((col("n_active") - coalesce(col("n_retained"), lit(0L)))
          .cast("double") / col("n_active"), 6).as("churn_rate"))
      .orderBy(col("m"))
  }

  val churnSql: String =
    """WITH act AS (SELECT DISTINCT o_custkey AS cust,
      |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m FROM orders),
      |nxt AS (SELECT cust, m - 1 AS m FROM act),
      |ret AS (SELECT act.m, COUNT(*) AS n_retained
      |  FROM act JOIN nxt ON act.cust = nxt.cust AND act.m = nxt.m GROUP BY 1),
      |mon AS (SELECT m, COUNT(*) AS n_active FROM act GROUP BY 1),
      |mx AS (SELECT MAX(m) AS mx FROM act)
      |SELECT mon.m, n_active, COALESCE(n_retained, 0) AS n_retained,
      |  n_active - COALESCE(n_retained, 0) AS n_churned,
      |  ROUND((n_active - COALESCE(n_retained, 0)) * 1.0 / n_active, 6)
      |    AS churn_rate
      |FROM mon LEFT JOIN ret ON mon.m = ret.m CROSS JOIN mx
      |WHERE mon.m < mx ORDER BY mon.m""".stripMargin

  /** Snapshot diff between corpus versions ([[TableDiff.diff]]): the new
    * version is derived deterministically from the old (every 50th doc
    * dropped, every 97th-mod-3 lang rewritten, every 61st-mod-5 re-added
    * under a shifted key), so both engines build identical versions and the
    * oracle replays the same chr(31)-fingerprint comparison.
    */
  def qTableDiff(spark: SparkSession, dir: String): DataFrame = {
    val old = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val newV = old.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 97 === 3, lit("xx")).otherwise(col("lang")).as("lang"),
        col("source"), col("n_chars"))
      .unionByName(old.filter(col("doc_id") % 61 === 5)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    TableDiff.diff(old, newV, "doc_id")
      .orderBy(col("key"))
  }

  val tableDiffSql: String =
    """WITH old AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
      |new_v AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id % 97 = 3 THEN 'xx' ELSE lang END AS lang,
      |    source, n_chars
      |  FROM old WHERE doc_id % 50 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang, source, n_chars
      |  FROM old WHERE doc_id % 61 = 5),
      |ofp AS (SELECT doc_id AS key, md5(concat_ws(chr(31),
      |    COALESCE(CAST(text AS VARCHAR), chr(30) || 'null'),
      |    COALESCE(CAST(lang AS VARCHAR), chr(30) || 'null'),
      |    COALESCE(CAST(source AS VARCHAR), chr(30) || 'null'),
      |    COALESCE(CAST(n_chars AS VARCHAR), chr(30) || 'null'))) AS old_fp
      |  FROM old),
      |nfp AS (SELECT doc_id AS key, md5(concat_ws(chr(31),
      |    COALESCE(CAST(text AS VARCHAR), chr(30) || 'null'),
      |    COALESCE(CAST(lang AS VARCHAR), chr(30) || 'null'),
      |    COALESCE(CAST(source AS VARCHAR), chr(30) || 'null'),
      |    COALESCE(CAST(n_chars AS VARCHAR), chr(30) || 'null'))) AS new_fp
      |  FROM new_v)
      |SELECT COALESCE(ofp.key, nfp.key) AS key,
      |  CASE WHEN old_fp IS NULL THEN 'added'
      |       WHEN new_fp IS NULL THEN 'removed'
      |       WHEN old_fp <> new_fp THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM ofp FULL OUTER JOIN nfp ON ofp.key = nfp.key
      |WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp
      |ORDER BY key""".stripMargin

  /** Heavy hitters via the SpaceSaving sketch
    * ([[graft.functions.SpaceSavingAggregator]]) in its EXACTNESS regime:
    * capacity (32) covers the event-type domain (5), so every counter is
    * exact with zero error and the result equals a plain GROUP BY — which is
    * what the oracle states. The approx regime (capacity ≪ domain) is
    * property-tested in SpaceSavingSpec; this query proves the Aggregator's
    * map-side partial-aggregation path end-to-end on real data.
    */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val s = spark
    import s.implicits._
    val types = Tables.events(spark, dir).select(col("event_type")).as[String]
    types.select(new graft.functions.SpaceSavingAggregator(32).toColumn)
      .toDF("sk")
      .select(explode(col("sk")).as("c"))
      .select(col("c.item").as("event_type"), col("c.est").as("n_events"),
        col("c.err").as("err"))
      .orderBy(col("event_type"))
  }

  val heavyHittersSql: String =
    """SELECT event_type, COUNT(*) AS n_events, 0 AS err
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Distinct-n diversity per source: distinct bigrams / total bigrams — the
    * standard degeneracy metric for (synthetic) text: repetitive generation
    * drives it toward 0, diverse text toward 1. Two aggregates over the
    * bigram explode; the per-source denominator rides the same aggregate.
    */
  def qDistinctNgrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.WordShingles.shingles(col("text"), 2)).as("bg"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("bg")).as("n_distinct"),
        round(countDistinct(col("bg")).cast("double") / count(lit(1)), 6)
          .as("distinct_2"))
      .orderBy(col("source"))

  val distinctNgramsSql: String =
    """WITH bg AS (SELECT source, unnest(list_transform(
      |    generate_series(1, greatest(len(l) - 1, 1)),
      |    i -> l[i] || ' ' || l[i+1])) AS bg
      |  FROM (SELECT source, string_split(text, ' ') AS l FROM documents))
      |SELECT source, COUNT(*) AS n_bigrams, COUNT(DISTINCT bg) AS n_distinct,
      |  ROUND(COUNT(DISTINCT bg) * 1.0 / COUNT(*), 6) AS distinct_2
      |FROM bg GROUP BY 1 ORDER BY 1""".stripMargin

  /** Two-proportion A/B significance test: users hash-split into arms (the
    * [[Splits.hashBucket]] draw — same deterministic assignment machinery as
    * the dataset splits), conversion = any purchase event, pooled two-
    * proportion z-score. The experimentation-analytics primitive: three
    * aggregates, all integer counts until the final closed-form doubles
    * (stated identically in the oracle). Conversion = a purchase above 90
    * (every generated user has some purchase, so the bare event would be
    * degenerate — rate 1.0 on both arms, z undefined).
    */
  def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 90,
        1L).otherwise(0L)).as("conv"))
      .withColumn("arm", when(Splits.hashBucket(col("user_id")) % 2 === 0,
        lit("A")).otherwise(lit("B")))
    val byArm = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("n_conv"))
    val a = byArm.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("n_conv").as("conv_a"))
    val b = byArm.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("n_conv").as("conv_b"))
    a.crossJoin(b)
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(col("conv_a").cast("double") / col("n_a"), 6).as("rate_a"),
        round(col("conv_b").cast("double") / col("n_b"), 6).as("rate_b"),
        round(
          (col("conv_a").cast("double") / col("n_a") -
            col("conv_b").cast("double") / col("n_b")) /
            sqrt(((col("conv_a") + col("conv_b")).cast("double") /
              (col("n_a") + col("n_b"))) *
              (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double") /
                (col("n_a") + col("n_b"))) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6).as("z"))
  }

  val abTestSql: String =
    """WITH u AS (SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' AND value > 90
      |        THEN 1 ELSE 0 END) AS conv,
      |    CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
      |        % 100) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      |  FROM events GROUP BY user_id),
      |ba AS (SELECT arm, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS n_conv
      |  FROM u GROUP BY 1),
      |a AS (SELECT n AS n_a, n_conv AS conv_a FROM ba WHERE arm = 'A'),
      |b AS (SELECT n AS n_b, n_conv AS conv_b FROM ba WHERE arm = 'B')
      |SELECT n_a, n_b, conv_a, conv_b,
      |  ROUND(conv_a * 1.0 / n_a, 6) AS rate_a,
      |  ROUND(conv_b * 1.0 / n_b, 6) AS rate_b,
      |  ROUND((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b) /
      |    sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b)) *
      |      (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b)) *
      |      (1.0 / n_a + 1.0 / n_b)), 6) AS z
      |FROM a CROSS JOIN b""".stripMargin

  /** RFM segmentation per market: recency / frequency / monetary quartiles
    * WITHIN each nation (windows partitioned by nation — parallel across
    * markets, no global NTILE) and the 3-digit segment code. The classic
    * customer-value segmentation, deterministic via (metric, custkey) total
    * orders.
    */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (unix_timestamp(col("o_orderdate")) / 86400L).cast("long").as("day"),
        AnalyticsQueries.dec(col("o_totalprice")).as("price"))
    val anchor = o.agg(max(col("day")).as("max_day"))
    val perCust = o.groupBy(col("o_custkey"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("frequency"),
        sum(col("price")).as("monetary_dec"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"), (col("max_day") - col("last_day")).as("recency"),
        col("frequency"), col("monetary_dec"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    def q(metric: org.apache.spark.sql.Column, asc: Boolean) = {
      val ordered = if (asc) Window.partitionBy(col("c_nationkey"))
        .orderBy(metric, col("o_custkey"))
      else Window.partitionBy(col("c_nationkey"))
        .orderBy(metric.desc, col("o_custkey"))
      ntile(4).over(ordered)
    }
    perCust
      .select(col("o_custkey").as("custkey"), col("c_nationkey").as("nation"),
        col("recency"), col("frequency"),
        round(col("monetary_dec").cast("double"), 2).as("monetary"),
        q(col("recency"), asc = true).as("r_q"), // low recency = best → quartile 1
        q(col("frequency"), asc = false).as("f_q"),
        q(col("monetary_dec"), asc = false).as("m_q"))
      .withColumn("segment",
        concat(col("r_q").cast("string"), col("f_q").cast("string"),
          col("m_q").cast("string")))
      .orderBy(col("custkey"))
  }

  val rfmSql: String =
    """WITH o AS (SELECT o_custkey,
      |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS price FROM orders),
      |a AS (SELECT MAX(day) AS max_day FROM o),
      |pc AS (SELECT o_custkey, MAX(day) AS last_day, COUNT(*) AS frequency,
      |    SUM(price) AS monetary_dec FROM o GROUP BY 1),
      |j AS (SELECT o_custkey, max_day - last_day AS recency, frequency,
      |    monetary_dec, c_nationkey
      |  FROM pc CROSS JOIN a JOIN customer ON o_custkey = c_custkey)
      |SELECT o_custkey AS custkey, c_nationkey AS nation, recency, frequency,
      |  ROUND(CAST(monetary_dec AS DOUBLE), 2) AS monetary,
      |  NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY recency, o_custkey) AS r_q,
      |  NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY frequency DESC, o_custkey) AS f_q,
      |  NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY monetary_dec DESC, o_custkey) AS m_q,
      |  CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY recency, o_custkey) AS VARCHAR) ||
      |  CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY frequency DESC, o_custkey) AS VARCHAR) ||
      |  CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY monetary_dec DESC, o_custkey) AS VARCHAR)
      |    AS segment
      |FROM j ORDER BY custkey""".stripMargin

  /** Target mixture in parts-per-million for [[qDomainMix]] — a deliberate
    * head/torso/tail skew over the 20 generated sources, exposed so the SQL
    * oracle embeds the SAME weights.
    */
  private[graft] val mixWeightsPpm: Seq[(String, Long)] =
    (0 until 5).map(i => s"src$i" -> 100000L) ++
      (5 until 15).map(i => s"src$i" -> 40000L) ++
      (15 until 20).map(i => s"src$i" -> 20000L)

  /** Domain-mixture resampling: deterministically downsample sources to the
    * target mixture, keeping the maximum total the scarcest source allows
    * ([[Splits.mixtureSample]]).
    */
  def qDomainMix(spark: SparkSession, dir: String): DataFrame =
    Splits.mixtureSample(
        Tables.documents(spark, dir).select(col("source"), col("doc_id")),
        "doc_id", "source", mixWeightsPpm)
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))

  val domainMixSql: String = {
    val values = mixWeightsPpm
      .map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    s"""WITH w AS (SELECT * FROM (VALUES $values) AS t(source, w_ppm)),
      |cw AS (SELECT d.source, COUNT(*) AS n_g, CAST(MAX(w.w_ppm) AS BIGINT) AS w_ppm
      |  FROM documents d JOIN w ON d.source = w.source GROUP BY 1),
      |m AS (SELECT MIN(CAST(FLOOR(n_g * 1000000 / w_ppm) AS BIGINT)) AS m FROM cw),
      |kept AS (SELECT source, CAST(FLOOR(w_ppm * m / 1000000) AS BIGINT) AS n_keep
      |  FROM cw CROSS JOIN m),
      |r AS (SELECT d.source, d.doc_id, k.n_keep,
      |    ROW_NUMBER() OVER (PARTITION BY d.source
      |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
      |  FROM documents d JOIN kept k ON d.source = k.source)
      |SELECT source, doc_id FROM r WHERE rk <= n_keep
      |ORDER BY source, doc_id""".stripMargin
  }

  /** Char-weighted Gopher repetition signals over word trigrams
    * ([[TextQuality.repetitionSignals]]).
    */
  def qRepetition(spark: SparkSession, dir: String): DataFrame =
    TextQuality.repetitionSignals(Tables.documents(spark, dir), "doc_id", "text",
        k = 3)
      .orderBy(col("doc_id"))

  val repetitionSql: String =
    """WITH tg AS (SELECT doc_id, unnest(list_transform(
      |    generate_series(1, greatest(len(l) - 2, 1)),
      |    i -> array_to_string(l[i:i+2], ' '))) AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
      |tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
      |a AS (SELECT doc_id,
      |    CAST(SUM(c * length(g)) AS BIGINT) AS w_total,
      |    CAST(SUM(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS BIGINT)
      |      AS w_dup
      |  FROM tc GROUP BY 1),
      |t AS (SELECT doc_id, c * length(g) AS w_top,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
      |  FROM tc)
      |SELECT a.doc_id, w_total, w_dup,
      |  ROUND(w_dup * 1.0 / w_total, 6) AS dup_ngram_char_frac,
      |  ROUND(t.w_top * 1.0 / w_total, 6) AS top_ngram_char_frac
      |FROM a JOIN t ON a.doc_id = t.doc_id AND t.rn = 1
      |ORDER BY a.doc_id""".stripMargin

  /** MinHash estimator diagnostics: estimated vs exact Jaccard for every LSH
    * candidate pair ([[Dedup.minhashEstimatePairs]]) — the tuning surface for
    * banding parameters.
    */
  def qMinhashEst(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashEstimatePairs(Tables.documents(spark, dir), "doc_id", "text",
        k = 3, numHashes = numHashes, rowsPerBand = rowsPerBand)
      .select(col("id_a"), col("id_b"),
        round(col("est_jaccard"), 6).as("est_jaccard"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))

  val minhashEstSql: String = {
    val matches = (0 until numHashes)
      .map(j => s"CASE WHEN a.mh_$j = b.mh_$j THEN 1.0 ELSE 0.0 END")
      .mkString("(", " + ", s") / $numHashes")
    s"""WITH $minhashPairCtesSql,
      |est AS (SELECT c.id_a, c.id_b, $matches AS est
      |  FROM cand c JOIN sig a ON c.id_a = a.doc_id JOIN sig b ON c.id_b = b.doc_id)
      |SELECT j.id_a, j.id_b, ROUND(est.est, 6) AS est_jaccard,
      |  ROUND(j.jaccard, 6) AS jaccard
      |FROM j JOIN est ON j.id_a = est.id_a AND j.id_b = est.id_b
      |ORDER BY j.id_a, j.id_b""".stripMargin
  }

  /** LSH candidate-recall curve ([[Dedup.lshRecallCurve]]): the measured
    * banding S-curve — per similarity decile, how many TRUE pairs (exact
    * all-pairs Jaccard ≥ 0.2) the MinHash banding surfaces.
    */
  def qLshRecallCurve(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshRecallCurve(Tables.documents(spark, dir), "doc_id", "text",
        k = 3, numHashes = numHashes, rowsPerBand = rowsPerBand,
        truthThreshold = 0.05)
      .orderBy(col("bucket"))

  val lshRecallCurveSql: String =
    s"""WITH $minhashSigBandCtesSql,
      |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |      FROM banded x JOIN banded y
      |        ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |tr AS (SELECT p.id_a, p.id_b,
      |      p.n_shared * 1.0 / (na.n_sh + nb.n_sh - p.n_shared) AS jaccard
      |      FROM p JOIN n na ON p.id_a = na.doc_id
      |      JOIN n nb ON p.id_b = nb.doc_id
      |      WHERE p.n_shared * 1.0 / (na.n_sh + nb.n_sh - p.n_shared) >= 0.05),
      |f AS (SELECT tr.jaccard,
      |      CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS found
      |  FROM tr LEFT JOIN cand c ON tr.id_a = c.id_a AND tr.id_b = c.id_b)
      |SELECT CAST(FLOOR(jaccard * 10) AS INT) AS bucket, COUNT(*) AS n_pairs,
      |  CAST(SUM(found) AS BIGINT) AS n_found,
      |  ROUND(SUM(found) * 1.0 / COUNT(*), 6) AS recall
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** Incremental ingest dedup: the corpus is split deterministically into an
    * "existing" store (md5 bucket < 80, ~80%) and an "incoming" batch (the
    * rest); every incoming doc is classified exact_dup / near_dup / new against
    * the store ([[Dedup.incrementalDedup]] — exact md5 match, then cross-set
    * MinHash-LSH candidates verified with exact Jaccard).
    */
  def qIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bucket = Splits.hashBucket(col("doc_id"))
    val incoming = docs.filter(bucket >= 80)
    val existing = docs.filter(bucket < 80)
    Dedup.incrementalDedup(incoming, existing, "doc_id", "text",
        k = 3, numHashes = numHashes, rowsPerBand = rowsPerBand, threshold = 0.5)
      .select(col("doc_id"), col("status"), col("match_id"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_id"))
  }

  val incrementalDedupSql: String =
    s"""WITH $minhashSigBandCtesSql,
      |mem AS (SELECT doc_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 >= 80
      |      AS is_inc
      |  FROM documents),
      |exk AS (SELECT COALESCE(md5(d.text), '__null_text__') AS hkey,
      |      MIN(d.doc_id) AS ex_id
      |  FROM documents d JOIN mem m ON d.doc_id = m.doc_id
      |  WHERE NOT m.is_inc GROUP BY 1),
      |inc AS (SELECT d.doc_id, COALESCE(md5(d.text), '__null_text__') AS hkey
      |  FROM documents d JOIN mem m ON d.doc_id = m.doc_id WHERE m.is_inc),
      |ex0 AS (SELECT i.doc_id, e.ex_id FROM inc i LEFT JOIN exk e ON i.hkey = e.hkey),
      |cand AS (SELECT DISTINCT x.doc_id AS id_in, y.doc_id AS id_ex
      |  FROM banded x
      |  JOIN ex0 f ON x.doc_id = f.doc_id AND f.ex_id IS NULL
      |  JOIN banded y ON x.band = y.band AND x.bkey = y.bkey
      |  JOIN mem my ON y.doc_id = my.doc_id AND NOT my.is_inc),
      |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |shared AS (SELECT c.id_in, c.id_ex, COUNT(*) AS n_shared
      |  FROM cand c JOIN sh a ON a.doc_id = c.id_in
      |  JOIN sh b ON b.doc_id = c.id_ex AND b.sh = a.sh GROUP BY 1, 2),
      |jj AS (SELECT c.id_in, c.id_ex,
      |    COALESCE(s.n_shared, 0) * 1.0
      |      / (na.n_sh + nb.n_sh - COALESCE(s.n_shared, 0)) AS jaccard
      |  FROM cand c LEFT JOIN shared s ON c.id_in = s.id_in AND c.id_ex = s.id_ex
      |  JOIN n na ON c.id_in = na.doc_id JOIN n nb ON c.id_ex = nb.doc_id),
      |best AS (SELECT id_in, id_ex, jaccard,
      |    ROW_NUMBER() OVER (PARTITION BY id_in ORDER BY jaccard DESC, id_ex) AS rn
      |  FROM jj WHERE jaccard >= 0.5)
      |SELECT e.doc_id,
      |  CASE WHEN e.ex_id IS NOT NULL THEN 'exact_dup'
      |       WHEN b.id_ex IS NOT NULL THEN 'near_dup' ELSE 'new' END AS status,
      |  COALESCE(e.ex_id, b.id_ex) AS match_id,
      |  ROUND(b.jaccard, 6) AS jaccard
      |FROM ex0 e LEFT JOIN best b ON e.doc_id = b.id_in AND b.rn = 1
      |ORDER BY e.doc_id""".stripMargin

  // -------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pack" -> (qSeqPack _),
    "q_seq_pack_greedy" -> (qSeqPackGreedy _),
    "q_pack_stats" -> (qPackStats _),
    "q_profile_docs" -> (qProfileDocs _),
    "q_equidepth_price" -> (qEquidepthPrice _),
    "q_numeric_corr" -> (qNumericCorr _),
    "q_span_dedup" -> (qSpanDedup _),
    "q_scd2_runs" -> (qScd2Runs _),
    "q_centroid_assign" -> (qCentroidAssign _),
    "q_semantic_dup" -> (qSemanticDup _),
    "q_source_kl" -> (qSourceKl _),
    "q_pit_join" -> (qPitJoin _),
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_exact_quantiles" -> (qExactQuantiles _),
    "q_dedup_prefix" -> (qDedupPrefix _),
    "q_price_pctrank" -> (qPricePctRank _),
    "q_skew_report" -> (qSkewReport _),
    "q_event_hourly_dense" -> (qEventHourlyDense _),
    "q_market_basket" -> (qMarketBasket _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_fold_variance" -> (qFoldVariance _),
    "q_transition_matrix" -> (qTransitionMatrix _),
    "q_decayed_popularity" -> (qDecayedPopularity _),
    "q_rolling_7d" -> (qRolling7d _),
    "q_pagerank" -> (qPagerank _),
    "q_churn" -> (qChurn _),
    "q_table_diff" -> (qTableDiff _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_distinct_ngrams" -> (qDistinctNgrams _),
    "q_session_funnel" -> (qSessionFunnel _),
    "q_ab_test" -> (qAbTest _),
    "q_rfm" -> (qRfm _),
    "q_collocations" -> (qCollocations _),
    "q_loo_split" -> (qLooSplit _),
    "q_domain_mix" -> (qDomainMix _),
    "q_repetition" -> (qRepetition _),
    "q_incremental_dedup" -> (qIncrementalDedup _),
    "q_minhash_est" -> (qMinhashEst _),
    "q_lsh_recall_curve" -> (qLshRecallCurve _),
    "q_blocking_quality" -> (qBlockingQuality _),
    "q_ngram_novelty" -> (qNgramNovelty _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_jaccard" -> (qDedupJaccard _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_simhash_pairs" -> (qSimhashPairs _),
    "q_dup_clusters" -> (qDupClusters _),
    "q_dup_clusters_lsh" -> (qDupClustersLsh _),
    "q_dup_pair_cosine" -> (qDupPairCosine _),
    "q_dedup_embed" -> (qDedupEmbed _),
    "q_simsearch_topk" -> (qSimsearchTopk _),
    "q_simsearch_batch" -> (qSimsearchBatch _),
    "q_simsearch_lsh" -> (qSimsearchLsh _),
    "q_lsh_multiprobe" -> (qLshMultiprobe _),
    "q_dedup_threshold_curve" -> (qDedupThresholdCurve _),
    "q_simsearch_quantized" -> (qSimsearchQuantized _),
    "q_corpus_curation" -> (qCorpusCuration _),
    "q_corpus_curation_lsh" -> (qCorpusCurationLsh _),
    "q_quality_quantiles" -> (qQualityQuantiles _),
    "q_dataset_split" -> (qDatasetSplit _),
    "q_balanced_sample" -> (qBalancedSample _),
    "q_repeat_orders" -> (qRepeatOrders _),
    "q_order_overlap" -> (qOrderOverlap _),
    "q_tfidf" -> (qTfidf _),
    "q_label_centroid" -> (qLabelCentroid _),
    "q_text_stats" -> (qTextStats _),
    "q_lang_id" -> (qLangId _),
    "q_lang_id_multi" -> (qLangIdMulti _),
    "q_token_count" -> (qTokenCount _),
    "q_fingerprint" -> (qFingerprint _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_hist" -> (qMultimodalHist _),
    "q_event_hourly" -> (qEventHourly _),
    "q_sliding_hourly" -> (qSlidingHourly _),
    "q_coverage_time" -> (qCoverageTime _),
    "q_sessionize" -> (qSessionize _),
    "q_sessionize_chunked" -> (qSessionizeChunked _),
    "q_asof_last_order" -> (qAsofLastOrder _),
    "q_asof_chunked" -> (qAsofChunked _),
    "q_event_props" -> (qEventProps _),
    "q_pricing_summary" -> (qPricingSummary _),
    "q_brand_revenue" -> (qBrandRevenue _),
    "q_gopher_quality" -> (qGopherQuality _),
    "q_top_ngrams" -> (qTopNgrams _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_funnel" -> (qFunnel _),
    "q_funnel_windowed" -> (qFunnelWindowed _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_quality_deciles" -> (qQualityDeciles _),
    "q_unigram_nll" -> (qUnigramNll _),
    "q_contamination" -> (qContamination _),
    "q_containment" -> (qContainment _),
    "q_knn_label_acc" -> (qKnnLabelAcc _),
    "q_embed_drift" -> (qEmbedDrift _),
    "q_bpe_pairs" -> (qBpePairs _),
    "q_bpe_train" -> (qBpeTrain _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_keyword_and" -> (qKeywordAnd _),
    "q_zipf_slope" -> (qZipfSlope _),
    "q_heaps_law" -> (qHeapsLaw _),
    "q_dup_rate_by_source" -> (qDupRateBySource _),
    "q_char_ngram_entropy" -> (qCharNgramEntropy _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_embed_quantize" -> (qEmbedQuantize _)
  )

  val oracleSql: Map[String, String] = Map(
    "q_seq_pack" -> seqPackSql,
    "q_seq_pack_greedy" -> seqPackGreedySql,
    "q_pack_stats" -> packStatsSql,
    "q_profile_docs" -> profileDocsSql,
    "q_equidepth_price" -> equidepthPriceSql,
    "q_numeric_corr" -> numericCorrSql,
    "q_span_dedup" -> spanDedupSql,
    "q_scd2_runs" -> scd2RunsSql,
    "q_centroid_assign" -> centroidAssignSql,
    "q_semantic_dup" -> semanticDupSql,
    "q_source_kl" -> sourceKlSql,
    "q_pit_join" -> pitJoinSql,
    "q_hybrid_rrf" -> hybridRrfSql,
    "q_exact_quantiles" -> exactQuantilesSql,
    "q_dedup_prefix" -> dedupPrefixSql,
    "q_price_pctrank" -> pricePctRankSql,
    "q_skew_report" -> skewReportSql,
    "q_event_hourly_dense" -> eventHourlyDenseSql,
    "q_market_basket" -> marketBasketSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_fold_variance" -> foldVarianceSql,
    "q_transition_matrix" -> transitionMatrixSql,
    "q_decayed_popularity" -> decayedPopularitySql,
    "q_rolling_7d" -> rolling7dSql,
    "q_pagerank" -> pagerankSql,
    "q_churn" -> churnSql,
    "q_table_diff" -> tableDiffSql,
    "q_heavy_hitters" -> heavyHittersSql,
    "q_distinct_ngrams" -> distinctNgramsSql,
    "q_session_funnel" -> sessionFunnelSql,
    "q_ab_test" -> abTestSql,
    "q_rfm" -> rfmSql,
    "q_collocations" -> collocationsSql,
    "q_loo_split" -> looSplitSql,
    "q_domain_mix" -> domainMixSql,
    "q_repetition" -> repetitionSql,
    "q_incremental_dedup" -> incrementalDedupSql,
    "q_minhash_est" -> minhashEstSql,
    "q_lsh_recall_curve" -> lshRecallCurveSql,
    "q_blocking_quality" -> blockingQualitySql,
    "q_ngram_novelty" -> ngramNoveltySql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_jaccard" -> dedupJaccardSql,
    "q_dedup_minhash" -> dedupMinhashSql,
    "q_dedup_simhash" -> dedupSimhashSql,
    "q_simhash_pairs" -> simhashPairsSql,
    "q_dup_clusters" -> dupClustersSql,
    "q_dup_clusters_lsh" -> dupClustersLshSql,
    "q_dup_pair_cosine" -> dupPairCosineSql,
    "q_dedup_embed" -> dedupEmbedSql,
    "q_simsearch_topk" -> simsearchTopkSql,
    "q_simsearch_batch" -> simsearchBatchSql,
    "q_simsearch_lsh" -> simsearchLshSql,
    "q_lsh_multiprobe" -> lshMultiprobeSql,
    "q_dedup_threshold_curve" -> dedupThresholdCurveSql,
    "q_simsearch_quantized" -> simsearchQuantizedSql,
    "q_corpus_curation" -> corpusCurationSql,
    "q_corpus_curation_lsh" -> corpusCurationLshSql,
    "q_quality_quantiles" -> qualityQuantilesSql,
    "q_dataset_split" -> datasetSplitSql,
    "q_balanced_sample" -> balancedSampleSql,
    "q_repeat_orders" -> repeatOrdersSql,
    "q_order_overlap" -> orderOverlapSql,
    "q_tfidf" -> tfidfSql,
    "q_label_centroid" -> labelCentroidSql,
    "q_text_stats" -> textStatsSql,
    "q_lang_id" -> langIdSql,
    "q_lang_id_multi" -> langIdMultiSql,
    "q_token_count" -> tokenCountSql,
    "q_fingerprint" -> fingerprintSql,
    "q_multimodal_meta" -> multimodalMetaSql,
    "q_multimodal_hist" -> multimodalHistSql,
    "q_event_hourly" -> eventHourlySql,
    "q_sliding_hourly" -> slidingHourlySql,
    "q_coverage_time" -> coverageTimeSql,
    "q_sessionize" -> sessionizeSql,
    "q_sessionize_chunked" -> sessionizeSql,
    "q_asof_last_order" -> asofLastOrderSql,
    "q_asof_chunked" -> asofLastOrderSql,
    "q_event_props" -> eventPropsSql,
    "q_pricing_summary" -> pricingSummarySql,
    "q_brand_revenue" -> brandRevenueSql,
    "q_gopher_quality" -> gopherQualitySql,
    "q_top_ngrams" -> topNgramsSql,
    "q_pii_redact" -> piiRedactSql,
    "q_funnel" -> funnelSql,
    "q_funnel_windowed" -> funnelWindowedSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_quality_deciles" -> qualityDecilesSql,
    "q_unigram_nll" -> unigramNllSql,
    "q_contamination" -> contaminationSql,
    "q_containment" -> containmentSql,
    "q_knn_label_acc" -> knnLabelAccSql,
    "q_embed_drift" -> embedDriftSql,
    "q_bpe_pairs" -> bpePairsSql,
    "q_keyword_and" -> keywordAndSql,
    "q_zipf_slope" -> zipfSlopeSql,
    "q_heaps_law" -> heapsLawSql,
    "q_dup_rate_by_source" -> dupRateBySourceSql,
    "q_char_ngram_entropy" -> charNgramEntropySql,
    "q_source_overlap" -> sourceOverlapSql,
    "q_embed_quantize" -> embedQuantizeSql
  )
}
