package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spearman rank correlation — the monotone-association companion of Pearson
  * (`q_numeric_corr`) and Kendall's τ-b (`q_kendall_tau`): Pearson computed on
  * average ranks, so it is outlier-robust and invariant under any monotone
  * transform of either variable. The reference library has no correlation
  * surface (its metrics are set/list-based — recmetrics_pyspark.py:106-173);
  * this extends the engine's statistics family per the north star.
  *
  * Tie handling is the textbook average-rank ("mid-rank") convention. To keep
  * every aggregate exact we work with DOUBLED average ranks, which are always
  * integers: for a value v with `cnt_less(v)` strictly-smaller rows and
  * `cnt_eq(v)` equal rows, the average rank is `cnt_less + (cnt_eq+1)/2`, so
  * `R2 = 2·cnt_less + cnt_eq + 1 ∈ ℕ`. Spearman's ρ is scale-invariant, so
  * Pearson over R2 equals Pearson over the true average ranks.
  *
  * Scale shape: ranks come from [[GlobalRank.globalRowNumber]] (two-phase
  * range-partition prefix numbering — no single-task global window). Within a
  * tie group the row numbering is arbitrary, but `min(rn)` per value is
  * always `cnt_less+1` regardless of intra-tie order, so
  * `R2 = 2·min(rn) + cnt_eq − 1` is deterministic. The rank MAP is one row
  * per distinct value (joined back by value — broadcast when narrow), and
  * the final moments (n, ΣRx, ΣRy, ΣRxRy, ΣRx², ΣRy²) accumulate in
  * DECIMAL — exact under any partition order, matching the DuckDB oracle
  * bit-for-bit. Magnitude bound: n·ΣR² ≈ 4n³ must stay below 1e38, i.e.
  * n ≲ 3e12 rows — comfortably past the 100 TB row counts this engine
  * targets per correlation scalar.
  */
object RankCorr {

  /** Doubled-average-rank map for one column: (value, R2). */
  private def rankMap2(df: DataFrame, c: String, out: String): DataFrame = {
    val ranked = GlobalRank.globalRowNumber(df.select(col(c)), Seq(col(c)))
    ranked.groupBy(col(c))
      .agg((lit(2) * min(col("rn")) + count(lit(1)) - 1).as(out))
  }

  /** Spearman's ρ between two numeric columns. Null rows (either side) are
    * excluded up front — a null has no rank. Output: one row
    * (n, spearman_rho), ρ as a raw double (caller rounds).
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val proj = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
    val rx = rankMap2(proj, "__x", "__rx")
    val ry = rankMap2(proj, "__y", "__ry")
    val pairs = proj
      .join(rx, "__x").join(ry, "__y")
      .select(col("__rx").cast("decimal(19,0)").as("rx"),
        col("__ry").cast("decimal(19,0)").as("ry"))
    val m = pairs.agg(
      count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("ry")).as("sxy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"))
    // exact integer moments → one double formula, same operation order as the
    // oracle: ρ = (nΣxy − ΣxΣy) / sqrt((nΣx² − Σx²)·(nΣy² − Σy²))
    m.select(col("n"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
        .as("spearman_rho"))
  }

  /** Empirical upper-tail dependence — the dependence measure correlation
    * can't see: `λ_U(q) = P(X > F_X⁻¹(q) | Y > F_Y⁻¹(q))` for high
    * quantiles q. Two variables can be ρ ≈ 0.3 "mildly correlated" yet
    * crash/spike TOGETHER (λ_U ≈ 1) — the risk question for capacity and
    * revenue concentration. λ_U ≈ 1 − q under independence; ≫ that means
    * joint extremes cluster.
    *
    * Thresholds are EXACT empirical quantiles via
    * [[GlobalRank.exactQuantiles]] (percentile_disc semantics — real data
    * values, no interpolation to drift across engines), then one scan with
    * the |probs|-row threshold table broadcast computes the conditional
    * counts. All counts integer; one division per row.
    *
    * Output per q asc: (p, tx, ty, n_joint, n_y, lambda_u).
    */
  def tailDependence(df: DataFrame, xCol: String, yCol: String,
                     tieCols: Seq[String], probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      s"probs must be in (0,1), got $probs")
    val qx = GlobalRank.exactQuantiles(
        df.select((xCol +: tieCols).map(col): _*), xCol, tieCols, probs)
      .select(col("p"), col("value").as("tx"))
    val qy = GlobalRank.exactQuantiles(
        df.select((yCol +: tieCols).map(col): _*), yCol, tieCols, probs)
      .select(col("p"), col("value").as("ty"))
    val th = qx.join(qy, Seq("p"))
    df.select(col(xCol).as("__x"), col(yCol).as("__y"))
      .crossJoin(broadcast(th))
      .groupBy(col("p"), col("tx"), col("ty"))
      .agg(sum(when(col("__y") > col("ty"), 1L).otherwise(0L)).as("n_y"),
        sum(when(col("__x") > col("tx") && col("__y") > col("ty"), 1L)
          .otherwise(0L)).as("n_joint"))
      .select(col("p"), col("tx"), col("ty"), col("n_joint"), col("n_y"),
        (col("n_joint").cast("double") / col("n_y")).as("lambda_u"))
      .orderBy(col("p"))
  }
}
