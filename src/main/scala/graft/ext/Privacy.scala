package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk audits for training-data release: k-anonymity
  * (Sweeney) and l-diversity (Machanavajjhala et al.) over quasi-identifier
  * columns. The companion of the redaction path (`TextQuality.piiRedact`
  * masks direct identifiers; this measures what the REMAINING columns still
  * leak through linkage).
  *
  * Scale shape: one hash aggregation on the quasi-identifier tuple — the
  * same cost envelope as any groupBy-count, map-side combined, no joins. The
  * distinct-sensitive count rides the same shuffle as a two-level aggregate
  * (exact, not a sketch — an at-risk audit must not under-count a class).
  */
object Privacy {

  /** Per-equivalence-class audit: group `df` by `quasiIds`, report class
    * size (k-anonymity: every class below `k` is linkable), the number of
    * distinct `sensitive` values (l-diversity: a class where every member
    * shares one sensitive value leaks it even at large k), and both risk
    * flags. Output: quasi-id columns + `class_size`, `l_diversity`,
    * `k_at_risk`, `l_at_risk`.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[Column], sensitive: Column,
                 k: Int, l: Int): DataFrame =
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_diversity"))
      .withColumn("k_at_risk", col("class_size") < k)
      .withColumn("l_at_risk", col("l_diversity") < l)

  /** Entropy ℓ-diversity (Machanavajjhala et al. §3.2 — the strict variant:
    * distinct-ℓ is satisfied by a class that is 99% one sensitive value,
    * entropy-ℓ is not). Per equivalence class: size, distinct sensitive
    * values, and the sensitive-value entropy in nats; a class satisfies
    * entropy ℓ-diversity iff H ≥ ln(ℓ). Exactness: the per-value terms
    * n_v·ln(n_v) pool in DECIMAL(28,15) (order-free), and the readout
    * H = ln(n) − S/n is one fixed-order double formula — the repo's
    * standard entropy discipline.
    */
  def entropyLDiversity(df: DataFrame, quasiIds: Seq[Column],
                        sensitive: Column): DataFrame = {
    val qiNames = quasiIds.zipWithIndex.map { case (_, i) => s"__qi$i" }
    val base = df.select(
      quasiIds.zip(qiNames).map { case (c, n) => c.as(n) } :+
        sensitive.as("__v"): _*)
    val perValue = base.groupBy(qiNames.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("n_v"))
    perValue.groupBy(qiNames.map(col): _*)
      .agg(sum(col("n_v")).as("class_size"),
        count(lit(1)).as("l_diversity"),
        sum((col("n_v").cast("double") * log(col("n_v").cast("double")))
          .cast("decimal(28,15)")).as("__s"))
      .select(qiNames.map(col) :+ col("class_size") :+ col("l_diversity") :+
        (log(col("class_size").cast("double")) -
          col("__s").cast("double") / col("class_size")).as("entropy"): _*)
  }

  /** One-row release gate over [[kAnonymity]]'s class table: the dataset's
    * k-anonymity level (min class size), diversity level (min distinct
    * sensitive), and how many ROWS sit in at-risk classes — the number a
    * release decision actually turns on (classes are not people).
    */
  def kAnonymitySummary(classes: DataFrame): DataFrame =
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("class_size")).as("n_rows"),
      min(col("class_size")).as("k_anonymity"),
      min(col("l_diversity")).as("l_level"),
      sum(when(col("k_at_risk"), col("class_size")).otherwise(lit(0L)))
        .as("rows_k_at_risk"),
      sum(when(col("l_at_risk"), col("class_size")).otherwise(lit(0L)))
        .as("rows_l_at_risk"))

  /** Differential-privacy SENSITIVITY audit — the deterministic half of any
    * DP release: before adding noise to a per-key count, one must know (and
    * usually clip) the maximum single-user contribution, because the
    * Laplace/Gaussian scale is proportional to that L1/L2 sensitivity. Per
    * aggregation key: total events, contributing users, the largest single
    * user's contribution and its share, plus the whale count (users above
    * `wholePct`% of the key's volume — exact integer comparison
    * `user_n·100 > n·wholePct`, no float thresholds). A key where one user
    * IS the count cannot be released at any useful ε without clipping.
    *
    * Scale shape: one (key, user) groupBy over the scan (map-side
    * combined), then one key-keyed max/conditional aggregate over the
    * user-contribution table. Output per key asc:
    * (key, n_events, n_users, max_user_n, max_share, n_whales).
    */
  def dpSensitivity(df: DataFrame, keyCol: String, userCol: String,
                    whalePct: Int = 1): DataFrame = {
    require(whalePct >= 1 && whalePct <= 100, s"bad whalePct $whalePct")
    val perUser = df.groupBy(col(keyCol).as("key"), col(userCol).as("usr"))
      .agg(count(lit(1)).as("user_n"))
    val perKey = perUser.groupBy(col("key"))
      .agg(sum(col("user_n")).as("n_events"),
        count(lit(1)).as("n_users"),
        max(col("user_n")).as("max_user_n"))
    val whales = perUser.join(perKey.select(col("key"), col("n_events")),
        Seq("key"))
      .filter(col("user_n") * 100 > col("n_events") * whalePct)
      .groupBy(col("key")).agg(count(lit(1)).as("n_whales"))
    perKey.join(whales, Seq("key"), "left").na.fill(0L, Seq("n_whales"))
      .select(col("key").as(keyCol), col("n_events"), col("n_users"),
        col("max_user_n"),
        (col("max_user_n").cast("double") / col("n_events"))
          .as("max_share"), col("n_whales"))
      .orderBy(col(keyCol))
  }

  /** t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) for an ORDERED
    * sensitive attribute: per equivalence class, the earth-mover's
    * distance between the class's sensitive-value distribution and the
    * GLOBAL one — the audit l-diversity misses when a class is "diverse"
    * but skewed toward one end of a severity scale. For ordered values
    * v_1 < … < v_m, EMD = (1/(m−1)) Σ_i |Σ_{j≤i} (p_j − q_j)|.
    *
    * Exactness: the cumulative differences pool as INTEGERS —
    * c_j·N − g_j·n_c (class count × global total minus global count ×
    * class size) — and a single double division by n_c·N·(m−1) happens at
    * the readout, so both engines agree bit-for-bit.
    *
    * Scale shape: one (quasi-ids, v) groupBy, one per-class aggregate, one
    * broadcast of the m-row global value table (the class×value grid is
    * #classes·m rows), and a class-PARTITIONED cumulative window over m
    * rows per class. Output per class: quasi-id columns + class_size,
    * emd, t_at_risk (emd > t).
    */
  def tCloseness(df: DataFrame, quasiIds: Seq[Column], sensitive: Column,
                 t: Double): DataFrame = {
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val qiNames = quasiIds.zipWithIndex.map { case (_, i) => s"__qi$i" }
    // The sensitive column keeps its NATIVE type: the cumulative-EMD window
    // below orders by __v, and a numeric ordered attribute (severity 1..10)
    // stringified would sort '10' < '2' and silently compute a wrong
    // ordered EMD. __v never surfaces in the output, so no cast is needed.
    val base = df.select(
      quasiIds.zip(qiNames).map { case (c, n) => c.as(n) } :+
        sensitive.as("__v"): _*)
    val cv = base.groupBy(qiNames.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("c_v"))
      .withColumnsRenamed(
        (qiNames.map(n => n -> s"${n}c") :+ ("__v" -> "__vc")).toMap)
    val cls = base.groupBy(qiNames.map(col): _*)
      .agg(count(lit(1)).as("n_c"))
    val gv = base.groupBy(col("__v")).agg(count(lit(1)).as("g_v"))
    val gtot = gv.agg(sum(col("g_v")).as("n_total"), count(lit(1)).as("m"))
    // dense class × global-value grid (gv and the 1-row total broadcast),
    // class count coalesced to 0 where the class lacks the value
    val dense = cls.crossJoin(broadcast(gv.crossJoin(gtot)))
      .join(cv,
        qiNames.map(n => col(n) === col(s"${n}c"))
          .reduce(_ && _) && col("__v") === col("__vc"), "left")
      .select(qiNames.map(col) ++ Seq(col("__v"), col("n_c"), col("g_v"),
        col("n_total"), col("m"),
        coalesce(col("c_v"), lit(0L)).as("c_v")): _*)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(qiNames.map(col): _*)
      .orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dense
      .withColumn("cum",
        sum(col("c_v") * col("n_total") - col("g_v") * col("n_c")).over(win))
      .groupBy(qiNames.map(col): _*)
      .agg(max(col("n_c")).as("class_size"),
        (sum(abs(col("cum"))).cast("double") /
          (max(col("n_c")) * max(col("n_total")) * (max(col("m")) - 1))
            .cast("double")).as("emd"))
      .withColumn("t_at_risk", col("emd") > t)
  }
}
