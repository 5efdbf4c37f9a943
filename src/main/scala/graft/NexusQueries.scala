package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 batch 3: shard-placement audits (consistent hashing,
  * rendezvous hashing), Apriori level-3 itemsets, absorbing-Markov
  * conversion probabilities, and entropy ℓ-diversity. Conventions as
  * everywhere: integer math wherever the semantics allow (all the hashing
  * audits are float-free), DECIMAL-pooled moments with one fixed-order
  * double readout elsewhere, ROUND(,6) only on O(1) magnitudes,
  * deterministic final ORDER BY.
  */
object NexusQueries {

  // --------------------------------------------------------------------------
  // Consistent-hash ring audit
  // --------------------------------------------------------------------------

  /** Consistent-hash placement of customers on a 16-node ring (8 virtual
    * nodes each), then the same ring grown to 17 nodes
    * ([[graft.ext.Sharding.consistentOwners]]): per node, keys before,
    * keys after, and keys moved away. The audit asserts the scheme's whole
    * point — adding a node steals only the keys landing on its arcs
    * (sum(moved_out) = node 16's keys_after, ~1/17 of the corpus), where a
    * mod-N shard map would relocate ~16/17 of it.
    */
  def qConsistentHash(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.Sharding
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
    val ring17 = Sharding.ring(spark, 17, 8)
      .localCheckpoint(eager = true) // both owner passes read it
    val ring16 = ring17.filter(col("node") < 16)
    val owners = Sharding
      .consistentOwners(cust, "c_custkey", ring16)
      .withColumnRenamed("node", "nb")
      .join(Sharding.consistentOwners(cust, "c_custkey", ring17)
        .withColumnRenamed("node", "na"), "key")
      .localCheckpoint(eager = true) // three count passes read it
    val nodes = spark.range(17).select(col("id").as("node"))
    nodes
      .join(owners.groupBy(col("nb").as("node"))
        .agg(count(lit(1)).as("kb")), Seq("node"), "left")
      .join(owners.groupBy(col("na").as("node"))
        .agg(count(lit(1)).as("ka")), Seq("node"), "left")
      .join(owners.filter(col("na") =!= col("nb"))
        .groupBy(col("nb").as("node"))
        .agg(count(lit(1)).as("mv")), Seq("node"), "left")
      .select(col("node"), coalesce(col("kb"), lit(0L)).as("keys_before"),
        coalesce(col("ka"), lit(0L)).as("keys_after"),
        coalesce(col("mv"), lit(0L)).as("moved_out"))
      .orderBy(col("node"))
  }

  /** Shared CTE chain: the 17-node ring, the hashed keys, and both owner
    * maps (16- and 17-node). */
  private val consistentHashCtesSql: String =
    """ring AS (SELECT n.node, v.v,
      |    ('0x' || substr(md5('n:' || n.node || ':' || v.v), 1, 8))::BIGINT
      |      AS ph
      |  FROM (SELECT unnest(generate_series(0, 16)) AS node) n
      |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS v) v),
      |k AS (SELECT c_custkey AS key,
      |    ('0x' || substr(md5('k:' || c_custkey), 1, 8))::BIGINT AS kh
      |  FROM customer),
      |s16 AS (SELECT key, node FROM (
      |    SELECT k.key, r.node,
      |      ROW_NUMBER() OVER (PARTITION BY k.key ORDER BY r.ph, r.node)
      |        AS rk
      |    FROM k JOIN ring r ON r.ph >= k.kh AND r.node < 16) WHERE rk = 1),
      |w16 AS (SELECT node FROM ring WHERE node < 16 ORDER BY ph, node
      |  LIMIT 1),
      |b16 AS (SELECT k.key, COALESCE(s.node, (SELECT node FROM w16))
      |    AS node
      |  FROM k LEFT JOIN s16 s ON k.key = s.key),
      |s17 AS (SELECT key, node FROM (
      |    SELECT k.key, r.node,
      |      ROW_NUMBER() OVER (PARTITION BY k.key ORDER BY r.ph, r.node)
      |        AS rk
      |    FROM k JOIN ring r ON r.ph >= k.kh) WHERE rk = 1),
      |w17 AS (SELECT node FROM ring ORDER BY ph, node LIMIT 1),
      |b17 AS (SELECT k.key, COALESCE(s.node, (SELECT node FROM w17))
      |    AS node
      |  FROM k LEFT JOIN s17 s ON k.key = s.key)""".stripMargin

  val consistentHashSql: String =
    s"""WITH $consistentHashCtesSql,
      |nodes AS (SELECT unnest(generate_series(0, 16)) AS node),
      |j AS (SELECT b16.key, b16.node AS nb, b17.node AS na
      |  FROM b16 JOIN b17 ON b16.key = b17.key)
      |SELECT n.node,
      |  CAST(COALESCE(kb.c, 0) AS BIGINT) AS keys_before,
      |  CAST(COALESCE(ka.c, 0) AS BIGINT) AS keys_after,
      |  CAST(COALESCE(mv.c, 0) AS BIGINT) AS moved_out
      |FROM nodes n
      |LEFT JOIN (SELECT nb AS node, COUNT(*) AS c FROM j GROUP BY 1) kb
      |  ON n.node = kb.node
      |LEFT JOIN (SELECT na AS node, COUNT(*) AS c FROM j GROUP BY 1) ka
      |  ON n.node = ka.node
      |LEFT JOIN (SELECT nb AS node, COUNT(*) AS c FROM j WHERE na <> nb
      |  GROUP BY 1) mv ON n.node = mv.node
      |ORDER BY n.node""".stripMargin

  // --------------------------------------------------------------------------
  // Rendezvous-hash failover audit
  // --------------------------------------------------------------------------

  /** Rendezvous (HRW) placement of customers on 16 nodes, then node 0
    * removed ([[graft.ext.Sharding.rendezvousOwners]]): per node, keys
    * before, keys after, and keys inherited from the dead node. HRW's
    * minimal-disruption guarantee is structural — a surviving node's argmax
    * cannot change — so keys_after = keys_before + inherited on every
    * surviving node, which NexusModulesSpec asserts.
    */
  def qRendezvous(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.Sharding
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
    val n16 = spark.range(16).select(col("id").as("node"))
    val owners = Sharding.rendezvousOwners(cust, "c_custkey", n16)
      .withColumnRenamed("node", "nb")
      .join(Sharding
        .rendezvousOwners(cust, "c_custkey", n16.filter(col("node") > 0))
        .withColumnRenamed("node", "na"), "key")
      .localCheckpoint(eager = true)
    n16
      .join(owners.groupBy(col("nb").as("node"))
        .agg(count(lit(1)).as("kb")), Seq("node"), "left")
      .join(owners.groupBy(col("na").as("node"))
        .agg(count(lit(1)).as("ka")), Seq("node"), "left")
      .join(owners.filter(col("nb") === 0)
        .groupBy(col("na").as("node"))
        .agg(count(lit(1)).as("ih")), Seq("node"), "left")
      .select(col("node"), coalesce(col("kb"), lit(0L)).as("keys_before"),
        coalesce(col("ka"), lit(0L)).as("keys_after"),
        coalesce(col("ih"), lit(0L)).as("inherited"))
      .orderBy(col("node"))
  }

  val rendezvousSql: String =
    """WITH nodes AS (SELECT unnest(generate_series(0, 15)) AS node),
      |k AS (SELECT c_custkey AS key FROM customer),
      |rnd AS (SELECT k.key, n.node,
      |    ('0x' || substr(md5('r:' || n.node || ':' || k.key), 1, 8))::BIGINT
      |      AS w
      |  FROM k CROSS JOIN nodes n),
      |b AS (SELECT key, node FROM (SELECT key, node, ROW_NUMBER() OVER
      |    (PARTITION BY key ORDER BY w DESC, node DESC) AS rk FROM rnd)
      |  WHERE rk = 1),
      |a AS (SELECT key, node FROM (SELECT key, node, ROW_NUMBER() OVER
      |    (PARTITION BY key ORDER BY w DESC, node DESC) AS rk FROM rnd
      |    WHERE node > 0)
      |  WHERE rk = 1),
      |j AS (SELECT b.key, b.node AS nb, a.node AS na
      |  FROM b JOIN a ON b.key = a.key)
      |SELECT n.node,
      |  CAST(COALESCE(kb.c, 0) AS BIGINT) AS keys_before,
      |  CAST(COALESCE(ka.c, 0) AS BIGINT) AS keys_after,
      |  CAST(COALESCE(ih.c, 0) AS BIGINT) AS inherited
      |FROM nodes n
      |LEFT JOIN (SELECT nb AS node, COUNT(*) AS c FROM j GROUP BY 1) kb
      |  ON n.node = kb.node
      |LEFT JOIN (SELECT na AS node, COUNT(*) AS c FROM j GROUP BY 1) ka
      |  ON n.node = ka.node
      |LEFT JOIN (SELECT na AS node, COUNT(*) AS c FROM j WHERE nb = 0
      |  GROUP BY 1) ih ON n.node = ih.node
      |ORDER BY n.node""".stripMargin

  // --------------------------------------------------------------------------
  // Apriori level-3 frequent itemsets
  // --------------------------------------------------------------------------

  /** Frequent brand TRIPLES in order baskets at support ≥ 1/500 of baskets
    * ([[graft.ext.Itemsets.frequentTriples]]), with the level-3 lift
    * readout — multi-way co-occurrence beyond `q_market_basket`'s pairs.
    * Top-20 by support. The oracle counts triples of frequent items
    * directly: by downward closure the Apriori pruning in the Spark plan is
    * a pure performance device and cannot change the result.
    */
  def qItemsets3(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("bk"), col("p_brand").as("it"))
    graft.ext.Itemsets.frequentTriples(baskets, "bk", "it",
        supNum = 1L, supDenom = 500L)
      .select(col("item_a"), col("item_b"), col("item_c"), col("support"),
        round(col("lift"), 6).as("lift"))
      .orderBy(col("support").desc, col("item_a"), col("item_b"),
        col("item_c"))
      .limit(20)
  }

  val itemsets3Sql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS bk, p.p_brand AS it
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |tot AS (SELECT COUNT(DISTINCT bk) AS nb FROM b),
      |s1 AS (SELECT it, COUNT(*) AS n1 FROM b GROUP BY 1
      |  HAVING COUNT(*) * 500 >= (SELECT nb FROM tot) * 1),
      |bf AS (SELECT b.bk, b.it FROM b JOIN s1 ON b.it = s1.it),
      |t3 AS (SELECT x.it AS ia, y.it AS ib, z.it AS ic, COUNT(*) AS n3
      |  FROM bf x JOIN bf y ON x.bk = y.bk AND x.it < y.it
      |  JOIN bf z ON y.bk = z.bk AND y.it < z.it
      |  GROUP BY 1, 2, 3
      |  HAVING COUNT(*) * 500 >= (SELECT nb FROM tot) * 1)
      |SELECT t3.ia AS item_a, t3.ib AS item_b, t3.ic AS item_c,
      |  CAST(t3.n3 AS BIGINT) AS support,
      |  ROUND(CAST(t3.n3 AS DOUBLE) * (SELECT nb FROM tot)
      |    * (SELECT nb FROM tot)
      |    / (CAST(a.n1 AS DOUBLE) * bb.n1 * c.n1), 6) AS lift
      |FROM t3 JOIN s1 a ON t3.ia = a.it JOIN s1 bb ON t3.ib = bb.it
      |JOIN s1 c ON t3.ic = c.it
      |ORDER BY support DESC, item_a, item_b, item_c LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // Absorbing-Markov conversion probability
  // --------------------------------------------------------------------------

  /** Probability of reaching 'purchase' within 4 steps from each event
    * state, by value iteration over the empirical transition matrix
    * ([[graft.ext.AbsorbingMarkov.absorptionProbability]]) — the
    * all-paths completion of `q_funnel`'s hand-picked sequence. The oracle
    * unrolls the same 4 DECIMAL-pooled rounds.
    */
  def qAbsorbingMarkov(spark: SparkSession, dir: String): DataFrame =
    graft.ext.AbsorbingMarkov.absorptionProbability(
        Tables.events(spark, dir), "user_id", Seq("ts", "event_id"),
        "event_type", absorbing = "purchase", iterations = 4)
      .select(col("state"), col("n_out"),
        round(col("p_absorb"), 6).as("p_absorb"))
      .orderBy(col("state"))

  val absorbingMarkovSql: String = {
    def round_(k: Int): String =
      s"""g$k AS (SELECT tr.s AS state,
        |    CAST(SUM(CAST(p.p * tr.n_st AS DECIMAL(28,15))) AS DOUBLE)
        |      / o.n_s AS pn
        |  FROM tr JOIN p${k - 1} p ON tr.t = p.state
        |  JOIN outs o ON tr.s = o.s GROUP BY tr.s, o.n_s),
        |p$k AS (SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1.0
        |    ELSE COALESCE(g$k.pn, 0.0) END AS p
        |  FROM st LEFT JOIN g$k ON st.state = g$k.state)""".stripMargin
    s"""WITH seq AS (SELECT user_id, event_type AS s,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t
      |  FROM events),
      |tr AS (SELECT s, t, COUNT(*) AS n_st FROM seq WHERE t IS NOT NULL
      |  GROUP BY 1, 2),
      |outs AS (SELECT s, CAST(SUM(n_st) AS BIGINT) AS n_s FROM tr
      |  GROUP BY 1),
      |st AS (SELECT DISTINCT event_type AS state FROM events),
      |p0 AS (SELECT state, CASE WHEN state = 'purchase' THEN 1.0 ELSE 0.0
      |    END AS p FROM st),
      |${round_(1)},
      |${round_(2)},
      |${round_(3)},
      |${round_(4)}
      |SELECT st.state, CAST(COALESCE(o.n_s, 0) AS BIGINT) AS n_out,
      |  ROUND(p4.p, 6) AS p_absorb
      |FROM st LEFT JOIN outs o ON st.state = o.s
      |JOIN p4 ON st.state = p4.state
      |ORDER BY st.state""".stripMargin
  }

  // --------------------------------------------------------------------------
  // Entropy l-diversity
  // --------------------------------------------------------------------------

  /** Entropy ℓ-diversity of order priority within (nation, market-segment)
    * equivalence classes ([[graft.ext.Privacy.entropyLDiversity]]) — the
    * strict variant of the `q_k_anonymity` release audit: a class that is
    * 99% one priority passes distinct-ℓ but fails entropy-ℓ.
    */
  def qEntropyL(spark: SparkSession, dir: String): DataFrame = {
    val rec = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"))
    graft.ext.Privacy.entropyLDiversity(rec,
        Seq(col("c_nationkey"), col("c_mktsegment")),
        col("o_orderpriority"))
      .select(col("__qi0").as("c_nationkey"),
        col("__qi1").as("c_mktsegment"),
        col("class_size"), col("l_diversity"),
        round(col("entropy"), 6).as("entropy"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  val entropyLSql: String =
    """WITH rec AS (SELECT c.c_nationkey, c.c_mktsegment,
      |    o.o_orderpriority AS v
      |  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey),
      |pv AS (SELECT c_nationkey, c_mktsegment, v, COUNT(*) AS n_v
      |  FROM rec GROUP BY 1, 2, 3),
      |cls AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(SUM(n_v) AS BIGINT) AS class_size,
      |    COUNT(*) AS l_diversity,
      |    SUM(CAST(n_v * LN(CAST(n_v AS DOUBLE)) AS DECIMAL(28,15))) AS s
      |  FROM pv GROUP BY 1, 2)
      |SELECT c_nationkey, c_mktsegment, class_size, l_diversity,
      |  ROUND(LN(CAST(class_size AS DOUBLE)) - CAST(s AS DOUBLE)
      |    / class_size, 6) AS entropy
      |FROM cls ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------
  // JL random-projection distortion
  // --------------------------------------------------------------------------

  /** 64→16-dim Johnson–Lindenstrauss projection with the hash-seeded ±1
    * matrix ([[graft.ext.RandomProjection]]), audited by the squared-
    * distance ratio histogram over id-sampled pairs — the read before
    * shrinking an embedding store 4×. Mass should sit at bucket 10
    * (ratio ≈ 1).
    */
  def qJlDistortion(spark: SparkSession, dir: String): DataFrame =
    graft.ext.RandomProjection.distortionHistogram(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        inDims = 64, outDims = 16, modA = 29, modB = 31)
      .select(col("bucket"), col("n_pairs"),
        round(col("mean_ratio"), 6).as("mean_ratio"))
      .orderBy(col("bucket"))

  val jlDistortionSql: String = {
    val sign = """(CASE WHEN ('0x' || substr(md5('jl:' || i || ':' || j),
      |        1, 8))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)""".stripMargin
    s"""WITH proj AS (SELECT vec_id, embedding,
      |    list_transform(generate_series(0, 15), i ->
      |      list_sum(list_transform(generate_series(1, 64), j ->
      |        embedding[j]::DOUBLE * $sign)) / sqrt(16.0)) AS y
      |  FROM embeddings WHERE vec_id % 29 = 0 OR vec_id % 31 = 0),
      |a AS (SELECT vec_id AS ida, embedding AS xa, y AS ya FROM proj
      |  WHERE vec_id % 29 = 0 ORDER BY vec_id LIMIT 256),
      |b AS (SELECT vec_id AS idb, embedding AS xb, y AS yb FROM proj
      |  WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT 256),
      |pr AS (SELECT
      |    list_sum(list_transform(generate_series(1, 64), j ->
      |      (xa[j]::DOUBLE - xb[j]::DOUBLE)
      |      * (xa[j]::DOUBLE - xb[j]::DOUBLE))) AS dx2,
      |    list_sum(list_transform(generate_series(1, 16), i ->
      |      (ya[i] - yb[i]) * (ya[i] - yb[i]))) AS dy2
      |  FROM a JOIN b ON ida < idb),
      |r AS (SELECT dy2 / dx2 AS ratio FROM pr WHERE dx2 > 0)
      |SELECT CAST(FLOOR(ratio * 10) AS BIGINT) AS bucket,
      |  COUNT(*) AS n_pairs,
      |  ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,9))) AS DOUBLE)
      |    / COUNT(*), 6) AS mean_ratio
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --------------------------------------------------------------------------
  // Haar wavelet energy decomposition
  // --------------------------------------------------------------------------

  /** Haar energy shares of the first 64 ship days' revenue (integer cents,
    * [[graft.ext.Wavelet.haarEnergyShares]]): which time scale — 2-day
    * spikes through 64-day regimes — carries the variation that
    * q_periodogram (frequency) and q_changepoint (single break) each see
    * only a slice of.
    */
  def qHaarEnergy(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
        .as("cents"))
      .orderBy(col("day")).limit(64)
    // d2_sum is emitted as a DIGIT STRING: it is the suite's only 128-bit
    // integer readout, and decimal128 surfaces hash differently across
    // DuckDB/Arrow builds even when the values are identical (the r8
    // q_market_share lesson in reverse). The exact DECIMAL(38,0) arithmetic
    // stays internal; only the portable string crosses the oracle boundary.
    graft.ext.Wavelet.haarEnergyShares(daily, "day", "cents", levels = 6)
      .select(col("level"), col("n_coeffs"),
        col("d2_sum").cast("string").as("d2_sum"),
        round(col("energy_share"), 6).as("energy_share"))
      .orderBy(col("level"))
  }

  val haarEnergySql: String =
    """WITH daily AS (SELECT day, cents FROM (
      |    SELECT CAST(l_shipdate AS DATE) AS day,
      |      CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
      |        AS BIGINT) AS cents
      |    FROM lineitem GROUP BY 1 ORDER BY 1 LIMIT 64)),
      |s AS (SELECT list(cents ORDER BY day) AS x FROM daily),
      |p AS (SELECT list_transform(generate_series(0, 64), i ->
      |    CAST(COALESCE(list_sum(list_slice(x, 1, i)), 0) AS BIGINT)) AS p
      |  FROM s),
      |lv AS (SELECT l.level, p.p, CAST(pow(2, l.level) AS BIGINT) AS sz
      |  FROM p CROSS JOIN
      |    (SELECT unnest(generate_series(1, 6)) AS level) l),
      |blk AS (SELECT level, sz, p, bb.b FROM lv CROSS JOIN
      |    (SELECT unnest(generate_series(0, 31)) AS b) bb
      |  WHERE bb.b <= 64 // sz - 1),
      |d AS (SELECT level, sz,
      |    CAST((p[CAST(b*sz + sz//2 AS INT) + 1] - p[CAST(b*sz AS INT) + 1])
      |       - (p[CAST((b+1)*sz AS INT) + 1]
      |          - p[CAST(b*sz + sz//2 AS INT) + 1]) AS DECIMAL(38,0))
      |      AS dd
      |  FROM blk),
      |en AS (SELECT level, COUNT(*) AS n_coeffs,
      |    CAST(SUM(dd * dd) AS DECIMAL(38,0)) AS d2_sum,
      |    CAST(CAST(SUM(dd * dd) AS DECIMAL(38,0))
      |      * CAST(pow(2, 6 - level) AS BIGINT) AS DECIMAL(38,0)) AS scaled
      |  FROM d GROUP BY 1),
      |tot AS (SELECT CAST(SUM(scaled) AS DECIMAL(38,0)) AS t FROM en)
      |SELECT CAST(level AS BIGINT) AS level, n_coeffs,
      |  CAST(d2_sum AS VARCHAR) AS d2_sum,
      |  ROUND(CAST(scaled AS DOUBLE)
      |    / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS energy_share
      |FROM en ORDER BY level""".stripMargin

  // --------------------------------------------------------------------------
  // CMS heavy-change detection
  // --------------------------------------------------------------------------

  /** Sketch-diff change detection audit ([[graft.ext.Sketches
    * .countMinHeavyChangeAudit]]): the stream splits at its time midpoint,
    * each half gets an independent CMS (d=4, w=64), and the estimated
    * per-user activity change is compared against the exact change for the
    * true top-10 movers — the accuracy read before replacing exact two-
    * window counts with sketches.
    */
  def qHeavyChange(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Sketches.countMinHeavyChangeAudit(
      Tables.events(spark, dir).withColumn("tsm", unix_millis(col("ts"))),
      "user_id", "tsm", k = 10, depth = 4, width = 64)

  val heavyChangeSql: String = {
    def bucketOf(item: String): String =
      s"""('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
        |      CAST($item AS VARCHAR)), 1, 8))::BIGINT % 64""".stripMargin
    s"""WITH ev AS (SELECT user_id AS item, epoch_ms(ts) AS tsm FROM events),
      |mid AS (SELECT MIN(tsm) + CAST(FLOOR((MAX(tsm) - MIN(tsm)) / 2.0)
      |    AS BIGINT) AS mid FROM ev),
      |tagged AS (SELECT item, tsm <= (SELECT mid FROM mid) AS fh FROM ev),
      |exact AS (SELECT item,
      |    CAST(SUM(CASE WHEN fh THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
      |    CAST(SUM(CASE WHEN fh THEN 0 ELSE 1 END) AS BIGINT) AS n_second
      |  FROM tagged GROUP BY 1),
      |top AS (SELECT item, n_first, n_second,
      |    ABS(n_second - n_first) AS true_change
      |  FROM exact ORDER BY ABS(n_second - n_first) DESC, item LIMIT 10),
      |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
      |c1 AS (SELECT item, COUNT(*) AS cnt FROM tagged WHERE fh GROUP BY 1),
      |c2 AS (SELECT item, COUNT(*) AS cnt FROM tagged WHERE NOT fh
      |  GROUP BY 1),
      |sk1 AS (SELECT j, ${bucketOf("item")} AS bucket, SUM(cnt) AS bc
      |  FROM c1 CROSS JOIN js GROUP BY 1, 2),
      |sk2 AS (SELECT j, ${bucketOf("item")} AS bucket, SUM(cnt) AS bc
      |  FROM c2 CROSS JOIN js GROUP BY 1, 2),
      |pr AS (SELECT t.item, j, ${bucketOf("t.item")} AS bucket
      |  FROM top t CROSS JOIN js),
      |e1 AS (SELECT item, CAST(MIN(COALESCE(s.bc, 0)) AS BIGINT)
      |    AS est_first
      |  FROM pr LEFT JOIN sk1 s USING (j, bucket) GROUP BY 1),
      |e2 AS (SELECT item, CAST(MIN(COALESCE(s.bc, 0)) AS BIGINT)
      |    AS est_second
      |  FROM pr LEFT JOIN sk2 s USING (j, bucket) GROUP BY 1)
      |SELECT t.item, t.n_first, t.n_second,
      |  CAST(t.true_change AS BIGINT) AS true_change,
      |  e1.est_first, e2.est_second,
      |  ABS(e2.est_second - e1.est_first) AS est_change
      |FROM top t JOIN e1 USING (item) JOIN e2 USING (item)
      |ORDER BY true_change DESC, item""".stripMargin
  }

  // --------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_consistent_hash" -> (qConsistentHash _),
    "q_rendezvous" -> (qRendezvous _),
    "q_itemsets3" -> (qItemsets3 _),
    "q_absorbing_markov" -> (qAbsorbingMarkov _),
    "q_entropy_l" -> (qEntropyL _),
    "q_jl_distortion" -> (qJlDistortion _),
    "q_haar_energy" -> (qHaarEnergy _),
    "q_heavy_change" -> (qHeavyChange _))

  val oracleSql: Map[String, String] = Map(
    "q_consistent_hash" -> consistentHashSql,
    "q_rendezvous" -> rendezvousSql,
    "q_itemsets3" -> itemsets3Sql,
    "q_absorbing_markov" -> absorbingMarkovSql,
    "q_entropy_l" -> entropyLSql,
    "q_jl_distortion" -> jlDistortionSql,
    "q_haar_energy" -> haarEnergySql,
    "q_heavy_change" -> heavyChangeSql)
}
