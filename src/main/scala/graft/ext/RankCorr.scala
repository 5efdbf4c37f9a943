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
}
