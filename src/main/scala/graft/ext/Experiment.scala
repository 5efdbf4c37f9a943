package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED (Controlled-experiment Using Pre-Experiment Data) — the industry-
  * standard variance-reduction readout for A/B tests: regress the experiment
  * metric `y` on a pre-period covariate `x`, report per-arm means of the
  * adjusted metric `y − θ(x − x̄)` plus the variance reduction factor ρ².
  *
  * Everything is derived from per-arm MOMENT SUMS (n, Σx, Σy, Σxy, Σx², Σy²):
  *  - θ = cov(x,y)/var(x) pools arms: θ = (NΣxy − ΣxΣy)/(NΣx² − (Σx)²).
  *  - mean_adj per arm needs no second pass — algebraically
  *    ȳ_a − θ(x̄_a − x̄), all from the same sums.
  *  - var_reduction = ρ² = cov²/(var(x)·var(y)).
  *
  * So the input crosses the shuffle once (the per-arm aggregate, map-side
  * combined); the global pooling runs on |arms| rows. Moments accumulate in
  * DECIMAL — exact under any partition order; the θ/ρ² division happens in
  * double on the exact aggregates, identically in any engine.
  *
  * Input: one row per unit (user) with its arm, pre-period covariate and
  * experiment-period metric. Output: one row per arm —
  * (arm, n, mean_y, mean_y_adj, theta, var_reduction).
  */
object Experiment {

  /** Sample-ratio-mismatch check — the first gate of any experiment readout:
    * a goodness-of-fit chi² of observed arm sizes against equal expected
    * shares. A significant chi² (dof = arms−1) means the assignment is
    * broken and every downstream metric is untrustworthy.
    *
    * Output: one row per arm (arm, n, expected, chi2, dof) — chi2/dof are
    * the experiment-level statistic repeated per row. One arm-keyed count
    * (map-side combined) plus an |arms|-row pool.
    */
  def srm(units: DataFrame, armCol: String): DataFrame = {
    val byArm = units.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = true)
    val g = byArm.agg(sum(col("n")).as("n_tot"), count(lit(1)).as("k"))
    val expected = col("n_tot").cast("double") / col("k").cast("double")
    val dev = col("n").cast("double") - expected
    byArm.crossJoin(broadcast(g))
      .withColumn("chi_term", (dev * dev / expected).cast("decimal(28,12)"))
      .withColumn("chi2_raw",
        sum(col("chi_term")).over(
          org.apache.spark.sql.expressions.Window.partitionBy())
          .cast("double"))
      // |arms| rows: the global window is arm-count bounded
      .select(col("arm"), col("n"),
        round(expected, 6).as("expected"),
        round(col("chi2_raw"), 6).as("chi2"),
        (col("k") - 1).as("dof"))
  }

  def cuped(units: DataFrame, armCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,4)")
    val y = col(yCol).cast("decimal(18,4)")
    val byArm = units.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      // consumed by the pooled aggregate AND the final select — materialize
      // the |arms|-row moment table once instead of re-running the unit scan
      .localCheckpoint(eager = true)
    // |arms| rows: pool exactly, then broadcast the scalar row back.
    val g = byArm.agg(
        sum(col("n")).as("gn"), sum(col("sx")).as("gsx"), sum(col("sy")).as("gsy"),
        sum(col("sxy")).as("gsxy"), sum(col("sxx")).as("gsxx"),
        sum(col("syy")).as("gsyy"))
      .select(
        col("gn").cast("double").as("gn"),
        col("gsx").cast("double").as("gsx"), col("gsy").cast("double").as("gsy"),
        col("gsxy").cast("double").as("gsxy"),
        col("gsxx").cast("double").as("gsxx"),
        col("gsyy").cast("double").as("gsyy"))
    val covN = col("gn") * col("gsxy") - col("gsx") * col("gsy")
    val varxN = col("gn") * col("gsxx") - col("gsx") * col("gsx")
    val varyN = col("gn") * col("gsyy") - col("gsy") * col("gsy")
    val theta = covN / when(varxN === 0.0, lit(null)).otherwise(varxN)
    val meanY = col("sy").cast("double") / col("n").cast("double")
    val meanX = col("sx").cast("double") / col("n").cast("double")
    byArm.crossJoin(broadcast(g))
      .select(col("arm"), col("n"),
        round(meanY, 6).as("mean_y"),
        round(meanY - theta * (meanX - col("gsx") / col("gn")), 6)
          .as("mean_y_adj"),
        round(theta, 6).as("theta"),
        round(covN * covN /
          when(varxN * varyN === 0.0, lit(null)).otherwise(varxN * varyN), 6)
          .as("var_reduction"))
  }
}
