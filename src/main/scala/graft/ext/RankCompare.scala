package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-comparison metrics. Rank-biased overlap (Webber, Moffat & Zobel
  * 2010) — the standard top-weighted similarity between two rankings (e.g.
  * yesterday's vs today's top products, or two candidate rankers in an A/B):
  * RBO_trunc = (1−p) · Σ_{d=1..D} p^{d−1} · |A_d ∩ B_d| / d, where A_d/B_d
  * are the depth-d prefixes. p ≈ 0.9 concentrates weight on the head.
  *
  * Scale shape: the inputs are already-ranked TOP-D lists (each the output
  * of a TakeOrderedAndProject or rank-window over the corpus), so everything
  * here is depth-bounded — the prefix-overlap counts come from one D-row
  * equi-join fanned out over a broadcast depth spine, and the 1-row total
  * sums the ≤D weighted terms in DECIMAL (partition-order exact).
  */
object RankCompare {

  /** Truncated RBO of two ranked lists sharing `idCol`; `rankCol` is 1-based
    * in both. Output: one row (depth, n_overlap, rbo) — n_overlap is the
    * prefix intersection at full depth.
    */
  def rbo(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
          depth: Int, p: Double = 0.9): DataFrame = {
    val m = a.select(col(idCol), col(rankCol).as("__ra"))
      .filter(col("__ra") <= depth)
      .join(b.select(col(idCol), col(rankCol).as("__rb"))
        .filter(col("__rb") <= depth), idCol)
    val depths = a.sparkSession.range(1, depth + 1).select(col("id").as("d"))
    val ov = m.crossJoin(broadcast(depths))
      .filter(col("d") >= greatest(col("__ra"), col("__rb")))
      .groupBy(col("d")).agg(count(lit(1)).as("ov"))
    // (1.0 − p) as an explicit subtraction on BOTH engines: the binary value
    // of 1.0−0.9 is not the literal 0.1
    ov.select(col("d"), col("ov"),
        (pow(lit(p), col("d") - 1) * col("ov") / col("d"))
          .cast("decimal(28,12)").as("__term"))
      .agg(
        coalesce(max(when(col("d") === depth, col("ov"))), lit(0L))
          .as("n_overlap"),
        round((lit(1.0) - lit(p)) *
          coalesce(sum(col("__term")), lit(0).cast("decimal(28,12)"))
            .cast("double"), 6).as("rbo"))
      .select(lit(depth).cast("long").as("depth"), col("n_overlap"),
        col("rbo"))
  }

  /** Kendall's τ-b rank correlation (tie-corrected) between two metrics over
    * the same keys — "do these two rankings agree?" without RBO's top-weight:
    * τ-b = (C − D) / √((n₀ − n₁)(n₀ − n₂)) with C/D the concordant and
    * discordant pair counts, n₀ = n(n−1)/2, and n₁/n₂ the tied-pair counts
    * within each metric (Kendall 1945). Complements [[rbo]] (which needs
    * ranked prefixes and ignores the tail) for whole-list agreement.
    *
    * `df` must be the PRE-AGGREGATED per-key frame with `xCol`/`yCol` exact
    * (long/DECIMAL) — the pair join is O(keys²) on that bounded frame (a
    * brand/source catalog, not the corpus), and every sign/tie count is an
    * exact integer; the only float is the final ratio. Output: 1 row
    * (n_keys, n_concordant, n_discordant, n_tied_x, n_tied_y, tau_b).
    */
  def kendallTau(df: DataFrame, idCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(xCol).as("__x"),
      col(yCol).as("__y"))
    val pairs = base.as("a").join(base.as("b"),
        col("a.__id") < col("b.__id"))
      .select(
        (signum(col("b.__x") - col("a.__x")) *
          signum(col("b.__y") - col("a.__y"))).cast("long").as("cd"),
        (col("a.__x") === col("b.__x")).cast("long").as("tx"),
        (col("a.__y") === col("b.__y")).cast("long").as("ty"))
    val n = base.agg(count(lit(1)).as("n_keys"))
    val agg = pairs.agg(
      coalesce(sum(when(col("cd") === 1, 1L).otherwise(0L)), lit(0L)).as("c"),
      coalesce(sum(when(col("cd") === -1, 1L).otherwise(0L)), lit(0L)).as("d"),
      coalesce(sum(col("tx")), lit(0L)).as("n_tied_x"),
      coalesce(sum(col("ty")), lit(0L)).as("n_tied_y"))
    n.crossJoin(agg)
      .withColumn("n0", expr("n_keys * (n_keys - 1) div 2"))
      .select(col("n_keys"), col("c").as("n_concordant"),
        col("d").as("n_discordant"), col("n_tied_x"), col("n_tied_y"),
        round((col("c") - col("d")).cast("double") /
          sqrt(((col("n0") - col("n_tied_x")) *
            (col("n0") - col("n_tied_y"))).cast("double")), 6).as("tau_b"))
  }

  /** Day-over-day top-k turnover ("leaderboard churn") — how volatile is
    * the daily top-k? For each consecutive day pair, the Jaccard overlap of
    * the two top-k key sets (ties toward the smaller key so both engines
    * pick identical sets). [[rbo]] compares ONE pair of rankings with rank
    * weighting; this tracks set stability as a time SERIES — the ops
    * monitor that distinguishes a stable catalog (high overlap) from a
    * thrashing one the day a ranking change ships.
    *
    * Scale shape: one (day, key) count aggregate over the scan; the top-k
    * rank window partitions BY DAY (parallel, bounded per partition); the
    * day-over-day match is an equi-join of two k-row-per-day frames on
    * (key, day+1). All counts integer.
    *
    * Output per day asc (days with a predecessor): (day, n_common,
    * jaccard).
    */
  def topKTurnover(df: DataFrame, dayCol: Column, keyCol: String,
                   k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(dayCol.as("day"), col(keyCol).as("key"))
      .groupBy(col("day"), col("key")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("n").desc, col("key"))
    val top = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("day"), col("key"))
    val prev = top.select(date_add(col("day"), 1).as("day"),
      col("key"))
    val common = top.join(prev, Seq("day", "key"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_common"))
    // actual top-set sizes: a day with fewer than k distinct keys has
    // |top| < k, and Jaccard must use |A|+|B|−common, not 2k−common
    val sizes = top.groupBy(col("day")).agg(count(lit(1)).as("__sz"))
    val prevSizes = sizes.select(date_add(col("day"), 1).as("day"),
      col("__sz").as("__psz"))
    // day spine: days that HAVE a predecessor day in the data
    val days = top.select(col("day")).distinct()
    val spine = days.join(
      days.select(date_add(col("day"), 1).as("day")), Seq("day"))
    spine.join(common, Seq("day"), "left").na.fill(0L, Seq("n_common"))
      .join(sizes, Seq("day")).join(prevSizes, Seq("day"))
      .select(col("day"), col("n_common"),
        (col("n_common").cast("double") /
          (col("__sz") + col("__psz") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy(col("day"))
  }
}
