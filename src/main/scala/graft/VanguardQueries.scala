package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Experiment, Mmr, Series, TextStats}

/** Round-7 batch: MMR shortlist diversification (the serving-side rerank every
  * retrieval stack runs after ANN), sample autocorrelation (the seasonality
  * probe behind forecasting-baseline choices), per-group ROC AUC via exact
  * rank sums (distributed model eval), and Flesch-Kincaid readability signals
  * (corpus quality gating). Registered into [[SparkEntry]]; every entry has a
  * DuckDB oracle with matching column names/types, 6-decimal rounding on
  * floating-point outputs and a deterministic ORDER BY.
  */
object VanguardQueries {

  // --------------------------------------------------------------------------
  // MMR rerank
  // --------------------------------------------------------------------------

  /** MMR(λ=0.5) selection of 5 from the cosine top-20 shortlist for vec 0. */
  def qMmrRerank(spark: SparkSession, dir: String): DataFrame =
    Mmr.rerank(Tables.embeddings(spark, dir), "vec_id", "embedding",
      queryId = 0L, candidates = 20, k = 5, lambda = 0.5)

  /** Index-ordered float→double cosine between two DuckDB list columns —
    * bit-identical to [[graft.ext.SimSearch.dot]]/norm (the q_simsearch_topk
    * precedent).
    */
  private def cosSql(a: String, b: String): String = {
    def dotSql(x: String, y: String): String =
      "list_sum(list_transform(generate_series(1, 64), " +
        s"i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
  }

  /** Unrolled greedy MMR — each step i: max-sim of every remaining candidate
    * against the i−1 selected, argmax of `0.5·rel − 0.5·maxsim` with id
    * tiebreak, identical to the Spark loop in [[graft.ext.Mmr.rerank]].
    */
  val mmrRerankSql: String = {
    val k = 5
    val steps = (2 to k).map { i =>
      val prev = i - 1
      s"""ms$i AS (SELECT c.vec_id, c.embedding, c.rel,
         |    MAX(${cosSql("c.embedding", "s.embedding")}) AS maxsim
         |  FROM cand c CROSS JOIN sel$prev s
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel$prev)
         |  GROUP BY c.vec_id, c.embedding, c.rel),
         |s$i AS (SELECT $i AS rnk, vec_id, embedding, rel,
         |    0.5 * rel - 0.5 * maxsim AS score
         |  FROM ms$i ORDER BY score DESC, vec_id LIMIT 1),
         |sel$i AS (SELECT vec_id, embedding FROM sel$prev
         |  UNION ALL SELECT vec_id, embedding FROM s$i)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k).map(i => s"SELECT rnk, vec_id, rel, score FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cand AS (SELECT e.vec_id, e.embedding,
       |    ${cosSql("e.embedding", "q.qe")} AS rel
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
       |  ORDER BY rel DESC, e.vec_id LIMIT 20),
       |s1 AS (SELECT 1 AS rnk, vec_id, embedding, rel,
       |    0.5 * rel - 0.5 * 0.0 AS score
       |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
       |sel1 AS (SELECT vec_id, embedding FROM s1),
       |$steps
       |SELECT rnk, vec_id, ROUND(rel, 6) AS relevance,
       |  ROUND(score, 6) AS mmr_score
       |FROM ($unionAll) ORDER BY rnk""".stripMargin
  }

  // --------------------------------------------------------------------------
  // Autocorrelation of daily revenue
  // --------------------------------------------------------------------------

  /** ACF(lags 1..10) of the daily order-revenue series. */
  def qAcf(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(AnalyticsQueries.dec(col("o_totalprice"))).as("x"))
    Series.acf(d, "day", "x", maxLag = 10)
  }

  val acfSql: String =
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
      |  FROM p GROUP BY 1)
      |SELECT lag, n_pairs,
      |  ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
      |FROM m ORDER BY lag""".stripMargin

  // --------------------------------------------------------------------------
  // Per-brand ROC AUC (does discount depth predict returns?)
  // --------------------------------------------------------------------------

  def qBrandAuc(spark: SparkSession, dir: String): DataFrame = {
    val j = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), col("l_discount").as("score"),
        (col("l_returnflag") === "R").cast("int").as("label"))
    Experiment.rankAuc(j, "brand", "score", "label")
  }

  val brandAucSql: String =
    """WITH j AS (SELECT p_brand AS brand, l_discount AS score,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |t AS (SELECT brand, score, COUNT(*) AS cnt,
      |    CAST(SUM(label) AS BIGINT) AS pos
      |  FROM j GROUP BY 1, 2),
      |r AS (SELECT brand, cnt, pos,
      |    2 * (SUM(cnt) OVER (PARTITION BY brand ORDER BY score) - cnt)
      |      + cnt + 1 AS r2
      |  FROM t),
      |a AS (SELECT brand, CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
      |    SUM(pos * r2) AS pr2
      |  FROM r GROUP BY 1)
      |SELECT brand, n_pos, n_neg,
      |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
      |    ELSE ROUND(CAST(pr2 - n_pos * (n_pos + 1) AS DOUBLE)
      |      / (2.0 * n_pos * n_neg), 6) END AS auc
      |FROM a ORDER BY brand""".stripMargin

  // --------------------------------------------------------------------------
  // BH-FDR brand scan: which brands have significantly deviant return rates?
  // --------------------------------------------------------------------------

  def qBhFdr(spark: SparkSession, dir: String): DataFrame = {
    val j = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        (col("l_returnflag") === "R").cast("int").as("ret"))
    Experiment.bhFdr(j, "brand", "ret", alpha = 0.05)
  }

  val bhFdrSql: String =
    """WITH j AS (SELECT p_brand AS brand,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |g AS (SELECT brand, COUNT(*) AS n, CAST(SUM(ret) AS BIGINT) AS pos
      |  FROM j GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS pp,
      |    COUNT(*) AS m FROM g),
      |sc AS (SELECT brand, n, pos, m,
      |    ROUND(CAST(pos AS DOUBLE) / n, 6) AS rate,
      |    CASE WHEN nn = n OR pp = 0 OR pp = nn THEN NULL ELSE
      |    ROUND((CAST(pos AS DOUBLE) / n - CAST(pp - pos AS DOUBLE) / (nn - n)) /
      |      sqrt((CAST(pp AS DOUBLE) / nn) * (1.0 - CAST(pp AS DOUBLE) / nn) *
      |        (1.0 / n + 1.0 / (nn - n))), 6) END AS z,
      |    CASE WHEN nn = n OR pp = 0 OR pp = nn THEN NULL ELSE
      |    abs((CAST(pos AS DOUBLE) / n - CAST(pp - pos AS DOUBLE) / (nn - n)) /
      |      sqrt((CAST(pp AS DOUBLE) / nn) * (1.0 - CAST(pp AS DOUBLE) / nn) *
      |        (1.0 / n + 1.0 / (nn - n)))) / sqrt(2.0) END AS x
      |  FROM g CROSS JOIN tot),
      |pv AS (SELECT brand, n, pos, m, rate, z,
      |    ROUND((1.0 / (1.0 + 0.3275911 * x)) * (0.254829592
      |      + (1.0 / (1.0 + 0.3275911 * x)) * (-0.284496736
      |      + (1.0 / (1.0 + 0.3275911 * x)) * (1.421413741
      |      + (1.0 / (1.0 + 0.3275911 * x)) * (-1.453152027
      |      + (1.0 / (1.0 + 0.3275911 * x)) * 1.061405429))))
      |      * exp(-(x * x)), 6) AS p_value
      |  FROM sc),
      |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p_value NULLS LAST, brand)
      |    AS bh_rank
      |  FROM pv),
      |fr AS (SELECT *, MAX(CASE WHEN p_value <= CAST(bh_rank AS DOUBLE)
      |      * 0.05 / m THEN bh_rank END) OVER () AS sig_rank
      |  FROM rk)
      |SELECT brand, n, pos, rate, z, p_value, bh_rank,
      |  bh_rank <= COALESCE(sig_rank, 0) AS significant
      |FROM fr ORDER BY bh_rank""".stripMargin

  // --------------------------------------------------------------------------
  // RAG chunking
  // --------------------------------------------------------------------------

  /** 50-token windows every 40 tokens (10-token overlap) over the corpus. */
  def qChunking(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Chunking.chunk(Tables.documents(spark, dir), "doc_id", "text",
        size = 50, stride = 40)
      .orderBy(col("doc_id"), col("chunk_idx"))

  val chunkingSql: String =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |st AS (SELECT doc_id, l,
      |    unnest(generate_series(1, GREATEST(len(l) - 10, 1), 40)) AS st
      |  FROM s)
      |SELECT doc_id,
      |  CAST((st - 1) // 40 + 1 AS BIGINT) AS chunk_idx,
      |  CAST(st AS BIGINT) AS start_token,
      |  CAST(LEAST(50, len(l) - st + 1) AS BIGINT) AS n_tokens,
      |  substr(md5(array_to_string(
      |    list_slice(l, st, st + LEAST(50, len(l) - st + 1) - 1), ' ')),
      |    1, 16) AS chunk_sig
      |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------------------------------------------------------------------
  // Skip-gram PMI
  // --------------------------------------------------------------------------

  /** Top-20 window-5 skip-gram pairs by PMI (support ≥ 5). */
  def qSkipgramPmi(spark: SparkSession, dir: String): DataFrame =
    TextStats.skipgramPmi(Tables.documents(spark, dir), "text",
      window = 5, k = 20, minCount = 5L)

  val skipgramPmiSql: String =
    """WITH s AS (SELECT string_split(text, ' ') AS w FROM documents),
      |pr AS (SELECT unnest(flatten(list_transform(
      |    generate_series(1, len(w)), i ->
      |      list_transform(generate_series(i + 1, LEAST(i + 5, len(w))), j ->
      |        {'w1': LEAST(w[i], w[j]), 'w2': GREATEST(w[i], w[j])})))) AS b
      |  FROM s),
      |p AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS n_pair
      |  FROM pr GROUP BY 1, 2),
      |u AS (SELECT unnest(w) AS t FROM s),
      |ug AS (SELECT t, COUNT(*) AS n_tok FROM u GROUP BY 1),
      |tot AS (SELECT CAST((SELECT SUM(n_pair) FROM p) AS BIGINT) AS t_pairs,
      |    CAST((SELECT SUM(n_tok) FROM ug) AS BIGINT) AS t_toks)
      |SELECT w1 || ' ' || w2 AS pair, n_pair,
      |  ROUND(ln(CAST(n_pair AS DOUBLE) * t_toks * t_toks /
      |    (CAST(t_pairs AS DOUBLE) * ua.n_tok * ub.n_tok)), 6) AS pmi
      |FROM p JOIN ug ua ON p.w1 = ua.t
      |  JOIN ug ub ON p.w2 = ub.t
      |  CROSS JOIN tot
      |WHERE n_pair >= 5
      |ORDER BY pmi DESC, pair LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // Readability
  // --------------------------------------------------------------------------

  def qReadability(spark: SparkSession, dir: String): DataFrame =
    TextStats.readabilityDF(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val readabilitySql: String =
    """WITH c AS (SELECT doc_id,
      |    len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
      |    GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CASE WHEN n_words = 0 THEN NULL
      |    ELSE ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
      |      + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 6)
      |  END AS fk_grade
      |FROM c ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // Farthest-point sampling (k-center coreset over embeddings)
  // --------------------------------------------------------------------------

  def qFpsSample(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Coreset.farthestPointSample(Tables.embeddings(spark, dir),
      "vec_id", "embedding", seedId = 0L, k = 5)

  /** Unrolled greedy k-center: b_i carries each point's running max-cosine to
    * the selected set (incremental GREATEST == full MAX — associative), s_i
    * is the argmin with id tiebreak. Identical to the Spark loop in
    * [[graft.ext.Coreset.farthestPointSample]].
    */
  val fpsSampleSql: String = {
    val k = 5
    val steps = (2 to k).map { i =>
      val prev = i - 1
      val stepCte =
        s"""s$i AS (SELECT vec_id, embedding, bs FROM b$prev
           |  ORDER BY bs ASC, vec_id LIMIT 1)""".stripMargin
      val nextB = if (i < k)
        s""",
           |b$i AS (SELECT b$prev.vec_id, b$prev.embedding,
           |    GREATEST(b$prev.bs, ${cosSql(s"b$prev.embedding", s"s$i.embedding")}) AS bs
           |  FROM b$prev CROSS JOIN s$i WHERE b$prev.vec_id <> s$i.vec_id)""".stripMargin
      else ""
      stepCte + nextB
    }.mkString(",\n")
    val unionAll = (2 to k).map(i =>
      s"UNION ALL SELECT $i AS rnk, vec_id, ROUND(bs, 6) AS farthest_sim FROM s$i")
      .mkString("\n")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |b1 AS (SELECT e.vec_id, e.embedding,
       |    ${cosSql("e.embedding", "q.qe")} AS bs
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
       |$steps
       |SELECT 1 AS rnk, CAST(0 AS BIGINT) AS vec_id,
       |  CAST(NULL AS DOUBLE) AS farthest_sim
       |$unionAll
       |ORDER BY rnk""".stripMargin
  }

  // --------------------------------------------------------------------------
  // Interpolated bigram LM scoring
  // --------------------------------------------------------------------------

  def qBigramNll(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextQuality.bigramNll(Tables.documents(spark, dir),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  val bigramNllSql: String =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |bg AS (SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i]))
      |      AS w1,
      |    unnest(list_transform(generate_series(1, len(l) - 1), i -> l[i+1]))
      |      AS w2
      |  FROM s),
      |dbf AS (SELECT doc_id, w1, w2, COUNT(*) AS bf FROM bg GROUP BY 1, 2, 3),
      |c2 AS (SELECT w1, w2, CAST(SUM(bf) AS BIGINT) AS cnt2
      |  FROM dbf GROUP BY 1, 2),
      |tok AS (SELECT unnest(l) AS t FROM s),
      |c1 AS (SELECT t, COUNT(*) AS cnt1 FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt1) AS BIGINT) AS total FROM c1)
      |SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
      |  ROUND(-CAST(SUM(CAST(bf * ln(0.7 * (CAST(cnt2 AS DOUBLE) / u1.cnt1)
      |      + 0.3 * (CAST(u2.cnt1 AS DOUBLE) / total)) AS DECIMAL(18,8)))
      |      AS DOUBLE) / CAST(SUM(bf) AS BIGINT), 6) AS avg_nll2
      |FROM dbf JOIN c2 USING (w1, w2)
      |  JOIN c1 u1 ON dbf.w1 = u1.t
      |  JOIN c1 u2 ON dbf.w2 = u2.t
      |  CROSS JOIN tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // Waiting suppliers (TPC-H Q21 idiom: correlated EXISTS + NOT EXISTS)
  // --------------------------------------------------------------------------

  /** Suppliers who single-handedly held up finalized multi-supplier orders:
    * their line shipped >60 days after the order date (late) while EVERY
    * other supplier on the order shipped on time. The Q21 plan shape —
    * one semi join (another supplier exists) + one anti join (no other late
    * supplier) over the same fact table, both equi-keyed on the order with a
    * supplier-inequality residual — exercises exactly the correlated-
    * subquery planning a warehouse engine must get right.
    */
  def qWaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
      .select(col("l_orderkey"), col("l_suppkey"))
    val hasOther = late.join(
      l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2")),
      col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
      "left_semi")
    val soleLate = hasOther.join(
      late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3")),
      col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
      "left_anti")
    soleLate.join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
  }

  val waitingSuppliersSql: String =
    """WITH f AS (SELECT o_orderkey, o_orderdate FROM orders
      |  WHERE o_orderstatus = 'F'),
      |late AS (SELECT l_orderkey, l_suppkey
      |  FROM lineitem JOIN f ON l_orderkey = o_orderkey
      |  WHERE date_diff('day', CAST(o_orderdate AS DATE),
      |    CAST(l_shipdate AS DATE)) > 60)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM late t JOIN supplier ON t.l_suppkey = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem x
      |    WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey <> t.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late y
      |    WHERE y.l_orderkey = t.l_orderkey AND y.l_suppkey <> t.l_suppkey)
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // Rank-biased overlap between the quantity and revenue item rankings
  // --------------------------------------------------------------------------

  /** RBO(p=0.9, depth 20) between "top items by total quantity" and "top
    * items by revenue" — how much do the two popularity notions agree at the
    * head?
    */
  def qRbo(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = Tables.lineitem(spark, dir)
    def topRanked(valued: DataFrame): DataFrame = {
      val top = valued.orderBy(col("v").desc, col("item")).limit(20)
      top.withColumn("rnk",
        row_number().over(Window.orderBy(col("v").desc, col("item"))))
    }
    val byQty = topRanked(l.groupBy(col("l_partkey").as("item"))
      .agg(sum(AnalyticsQueries.dec(col("l_quantity"))).as("v")))
    val byRev = topRanked(l.groupBy(col("l_partkey").as("item"))
      .agg(AnalyticsQueries.revenueDec(col("l_extendedprice"),
        col("l_discount")).as("v")))
    graft.ext.RankCompare.rbo(byQty, byRev, "item", "rnk",
      depth = 20, p = 0.9)
  }

  val rboSql: String =
    """WITH qty AS (SELECT l_partkey AS item,
      |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS v FROM lineitem GROUP BY 1),
      |rev AS (SELECT l_partkey AS item,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |      * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS v
      |  FROM lineitem GROUP BY 1),
      |ra AS (SELECT item, r FROM (SELECT item,
      |    ROW_NUMBER() OVER (ORDER BY v DESC, item) AS r FROM qty) WHERE r <= 20),
      |rb AS (SELECT item, r FROM (SELECT item,
      |    ROW_NUMBER() OVER (ORDER BY v DESC, item) AS r FROM rev) WHERE r <= 20),
      |m AS (SELECT ra.item, ra.r AS rnk_a, rb.r AS rnk_b
      |  FROM ra JOIN rb USING (item)),
      |ds AS (SELECT unnest(generate_series(1, 20)) AS d),
      |ov AS (SELECT ds.d, COUNT(*) AS ov FROM m JOIN ds
      |    ON ds.d >= GREATEST(m.rnk_a, m.rnk_b) GROUP BY 1),
      |t AS (SELECT d, ov,
      |    CAST(POWER(0.9, d - 1) * ov / d AS DECIMAL(28,12)) AS term FROM ov)
      |SELECT CAST(20 AS BIGINT) AS depth,
      |  COALESCE(MAX(CASE WHEN d = 20 THEN ov END), 0) AS n_overlap,
      |  ROUND((1.0 - 0.9) * CAST(COALESCE(SUM(term), 0) AS DOUBLE), 6) AS rbo
      |FROM t""".stripMargin

  // --------------------------------------------------------------------------
  // Deletion-propagation sweep (right-to-be-forgotten impact audit)
  // --------------------------------------------------------------------------

  /** Given a deterministic user blacklist (custkey % 97 = 0, standing in for
    * a deletion-request table), count the rows each table must drop —
    * cascading through the FK chain (lineitem is reached via its orders).
    * The audit every deletion pipeline runs before executing: the actual
    * deletes are anti-joins with exactly these join shapes.
    */
  def qDeletionSweep(spark: SparkSession, dir: String): DataFrame = {
    val bl = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("uid"))
    val o = Tables.orders(spark, dir)
    val delOrders = o.join(broadcast(bl), col("o_custkey") === col("uid"))
    def cnt(df: DataFrame, rel: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows")).select(lit(rel).as("relation"),
        col("n_rows"))
    cnt(bl, "customer")
      .unionByName(cnt(delOrders, "orders"))
      .unionByName(cnt(Tables.lineitem(spark, dir)
        .join(delOrders.select(col("o_orderkey").as("dok")),
          col("l_orderkey") === col("dok")), "lineitem"))
      .unionByName(cnt(Tables.events(spark, dir)
        .join(broadcast(bl), col("user_id") === col("uid")), "events"))
      .orderBy(col("relation"))
  }

  val deletionSweepSql: String =
    """WITH bl AS (SELECT c_custkey AS uid FROM customer WHERE c_custkey % 97 = 0),
      |do_ AS (SELECT o_orderkey FROM orders JOIN bl ON o_custkey = uid)
      |SELECT 'customer' AS relation, COUNT(*) AS n_rows FROM bl
      |UNION ALL SELECT 'orders', COUNT(*) FROM do_
      |UNION ALL SELECT 'lineitem', COUNT(*)
      |  FROM lineitem JOIN do_ ON l_orderkey = o_orderkey
      |UNION ALL SELECT 'events', COUNT(*)
      |  FROM events JOIN bl ON user_id = uid
      |ORDER BY relation""".stripMargin

  // --------------------------------------------------------------------------
  // Data-contract gate: many rules, ONE scan
  // --------------------------------------------------------------------------

  /** Schema/constraint gate over lineitem as conditional aggregates in a
    * single scan — the shape that matters at 100 TB: N rules cost one pass,
    * not N. Generated data is clean, so the oracle run doubles as a
    * zero-violations regression; the rule logic itself is fixture-tested.
    */
  def qDataContract(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    def viol(cond: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(cond, 1L).otherwise(0L))
    val wide = l.agg(
      count(lit(1)).as("n_rows"),
      viol(col("l_quantity") <= 0 || col("l_quantity") > 60)
        .as("quantity_range"),
      viol(col("l_discount") < 0 || col("l_discount") > 0.2)
        .as("discount_range"),
      viol(!col("l_returnflag").isin("A", "N", "R")).as("returnflag_enum"),
      viol(col("l_extendedprice").isNull || col("l_extendedprice") <= 0)
        .as("price_positive"),
      viol(col("l_shipdate").isNull).as("shipdate_null"))
    wide.select(explode(array(
        Seq(("quantity_range", col("quantity_range")),
          ("discount_range", col("discount_range")),
          ("returnflag_enum", col("returnflag_enum")),
          ("price_positive", col("price_positive")),
          ("shipdate_null", col("shipdate_null"))).map { case (n, c) =>
          struct(lit(n).as("rule"), col("n_rows"), c.as("n_violations"))
        }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"))
      .orderBy(col("rule"))
  }

  val dataContractSql: String =
    """WITH w AS (SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 60
      |    THEN 1 ELSE 0 END) AS BIGINT) AS quantity_range,
      |  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS discount_range,
      |  CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS returnflag_enum,
      |  CAST(SUM(CASE WHEN l_extendedprice IS NULL OR l_extendedprice <= 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS price_positive,
      |  CAST(SUM(CASE WHEN l_shipdate IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS shipdate_null
      |  FROM lineitem)
      |SELECT 'discount_range' AS rule, n_rows, discount_range AS n_violations
      |  FROM w
      |UNION ALL SELECT 'price_positive', n_rows, price_positive FROM w
      |UNION ALL SELECT 'quantity_range', n_rows, quantity_range FROM w
      |UNION ALL SELECT 'returnflag_enum', n_rows, returnflag_enum FROM w
      |UNION ALL SELECT 'shipdate_null', n_rows, shipdate_null FROM w
      |ORDER BY rule""".stripMargin

  // --------------------------------------------------------------------------
  // Data selection: DSIR importance weights, token-budget pick, interleave
  // --------------------------------------------------------------------------

  /** DSIR importance log-weights toward the English slice of the corpus
    * ([[graft.ext.Importance.dsirLogWeights]], 256 hash buckets).
    */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Importance.dsirLogWeights(Tables.documents(spark, dir),
        "doc_id", "text", isTarget = col("lang") === "en", numBuckets = 256)
      .orderBy(col("doc_id"))

  val dsirWeightsSql: String =
    """WITH toks AS (SELECT doc_id, lang = 'en' AS t,
      |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS b
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)),
      |dist AS (SELECT b, COUNT(*) AS n_raw,
      |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
      |  FROM toks GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_raw) AS BIGINT) AS nr,
      |    CAST(SUM(n_tgt) AS BIGINT) AS nt FROM dist),
      |lr AS (SELECT b,
      |    CAST(ln((n_tgt + 1) * 1.0 / (nt + 256))
      |      - ln((n_raw + 1) * 1.0 / (nr + 256)) AS DECIMAL(12,6)) AS lr
      |  FROM dist CROSS JOIN tot),
      |dc AS (SELECT doc_id, b, COUNT(*) AS c FROM toks GROUP BY 1, 2)
      |SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  ROUND(CAST(SUM(c * lr) AS DOUBLE), 6) AS log_weight
      |FROM dc JOIN lr ON dc.b = lr.b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Greedy token-budget selection ([[graft.ext.Importance.tokenBudgetSelect]]):
    * keep the highest-lexical-density documents until 20k tokens are spent.
    */
  def qTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val nTokens =
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("long")
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), nTokens.as("n_toks"),
        round(nTokens.cast("double") / col("n_chars"), 6).as("density"))
    graft.ext.Importance.tokenBudgetSelect(scored, "doc_id", "density",
        "n_toks", budget = 20000L)
      .orderBy(col("sel_rank"))
  }

  val tokenBudgetSql: String =
    """WITH d AS (SELECT doc_id,
      |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
      |      AS n_tokens,
      |    ROUND((length(text) - length(replace(text, ' ', '')) + 1) * 1.0
      |      / n_chars, 6) AS score
      |  FROM documents),
      |r AS (SELECT doc_id, score, n_tokens,
      |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS sel_rank,
      |    CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM d)
      |SELECT doc_id, score, n_tokens, sel_rank, cum_tokens
      |FROM r WHERE cum_tokens <= 20000 ORDER BY sel_rank""".stripMargin

  /** Proportional source interleave ([[graft.ext.Importance.interleaveBySource]]):
    * the deterministic global training order with same-source runs bounded by
    * corpus share.
    */
  def qInterleaveOrder(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Importance.interleaveBySource(Tables.documents(spark, dir),
        "doc_id", "source")
      .orderBy(col("position"))

  val interleaveOrderSql: String =
    """WITH k AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS m
      |  FROM documents),
      |r AS (SELECT doc_id, source, m,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY m, doc_id) AS rr,
      |    COUNT(*) OVER (PARTITION BY source) AS n
      |  FROM k)
      |SELECT ROW_NUMBER() OVER (ORDER BY ROUND((rr - 0.5) / n, 6), m, doc_id)
      |    AS position,
      |  doc_id, source, ROUND((rr - 0.5) / n, 6) AS interleave_key
      |FROM r ORDER BY position""".stripMargin

  // --------------------------------------------------------------------------
  // Registration
  // --------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mmr_rerank" -> (qMmrRerank _),
    "q_acf" -> (qAcf _),
    "q_brand_auc" -> (qBrandAuc _),
    "q_bh_fdr" -> (qBhFdr _),
    "q_fps_sample" -> (qFpsSample _),
    "q_bigram_nll" -> (qBigramNll _),
    "q_waiting_suppliers" -> (qWaitingSuppliers _),
    "q_rbo" -> (qRbo _),
    "q_chunking" -> (qChunking _),
    "q_skipgram_pmi" -> (qSkipgramPmi _),
    "q_deletion_sweep" -> (qDeletionSweep _),
    "q_data_contract" -> (qDataContract _),
    "q_readability" -> (qReadability _),
    "q_dsir_weights" -> (qDsirWeights _),
    "q_token_budget" -> (qTokenBudget _),
    "q_interleave_order" -> (qInterleaveOrder _))

  val oracleSql: Map[String, String] = Map(
    "q_mmr_rerank" -> mmrRerankSql,
    "q_acf" -> acfSql,
    "q_brand_auc" -> brandAucSql,
    "q_bh_fdr" -> bhFdrSql,
    "q_fps_sample" -> fpsSampleSql,
    "q_bigram_nll" -> bigramNllSql,
    "q_waiting_suppliers" -> waitingSuppliersSql,
    "q_rbo" -> rboSql,
    "q_chunking" -> chunkingSql,
    "q_skipgram_pmi" -> skipgramPmiSql,
    "q_deletion_sweep" -> deletionSweepSql,
    "q_data_contract" -> dataContractSql,
    "q_readability" -> readabilitySql,
    "q_dsir_weights" -> dsirWeightsSql,
    "q_token_budget" -> tokenBudgetSql,
    "q_interleave_order" -> interleaveOrderSql)
}
