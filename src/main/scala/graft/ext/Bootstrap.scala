package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — distribution-free confidence intervals
  * for per-group means at corpus scale. Classic resampling draws n rows with
  * replacement per replicate (a shuffle per replicate, non-reproducible);
  * the Poisson approximation (Chamandy et al., "Estimating Uncertainty for
  * Massive Data Streams", 2012) gives each (row, replicate) an independent
  * Poisson(1) weight instead, which vectorizes into ONE pass: explode rows ×
  * replicates map-side, weight from an md5-derived uniform (reproducible
  * across engines and runs — the [[Splits]] discipline), partial-aggregate
  * per (group, replicate), then take empirical quantiles over the replicate
  * means.
  *
  * Scale shape: the exploded stream is rows × reps but collapses map-side
  * into (group × reps) partial aggregates — nothing row-scale crosses the
  * shuffle. Replicate means are |groups|·reps rows; the final exact
  * `percentile` sorts reps values per group. Weighted sums ride DECIMAL so
  * both engines (and any partition order) see identical replicate means.
  */
object Bootstrap {

  /** Poisson(1) weight from a uniform in [0,1): inverse-CDF ladder with
    * hard-coded thresholds (cumulative e⁻¹·Σ1/k!) so both engines compare
    * the same double literals. P(w > 6) < 1e-4 mass folds into w = 6.
    */
  def poissonWeight(u: Column): Column =
    when(u < 0.36787944117144233, lit(0L))
      .when(u < 0.7357588823428847, lit(1L))
      .when(u < 0.9196986029286059, lit(2L))
      .when(u < 0.9810118431238463, lit(3L))
      .when(u < 0.9963401531726564, lit(4L))
      .when(u < 0.9994058151824184, lit(5L))
      .otherwise(lit(6L))

  /** Uniform in [0,1) from md5(id:rep) — 52 bits, exactly representable. */
  def md5Uniform(id: Column, rep: Column): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":"),
      rep.cast("string"))), 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0) // 2^52

  /** Per-group mean with a bootstrap CI.
    * Output: (groupCols..., n, mean, ci_lo, ci_hi) — `mean` the exact group
    * mean of `valCol`, the CI the [α/2, 1−α/2] empirical quantiles of `reps`
    * Poisson-bootstrap replicate means. `idCol` must identify rows uniquely
    * (it seeds the per-row uniforms).
    */
  def groupMeanCi(df: DataFrame, groupCols: Seq[String], valCol: String,
                  idCol: String, reps: Int = 50,
                  alpha: Double = 0.05): DataFrame = {
    require(reps >= 2 && alpha > 0 && alpha < 1, "need reps >= 2, 0 < alpha < 1")
    val dec = (c: Column) => c.cast("decimal(18,4)")
    val base = df.select(
      groupCols.map(col) :+ col(valCol).as("v") :+ col(idCol).as("rid"): _*)
    val weighted = base
      .select(groupCols.map(col) :+ col("v") :+ col("rid") :+
        explode(sequence(lit(0), lit(reps - 1))).as("rep"): _*)
      .withColumn("w", poissonWeight(md5Uniform(col("rid"), col("rep"))))
    val rmeans = weighted
      .groupBy(groupCols.map(col) :+ col("rep"): _*)
      .agg((sum(dec(col("v")) * col("w")).cast("double") /
        sum(col("w"))).as("rm"))
    val actual = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (sum(dec(col("v"))).cast("double") / count(lit(1))).as("mean"))
    val ci = rmeans.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(rm, ${alpha / 2})").as("ci_lo"),
        expr(s"percentile(rm, ${1 - alpha / 2})").as("ci_hi"))
    actual.join(ci, groupCols)
      .select(groupCols.map(col) :+ col("n") :+
        round(col("mean"), 6).as("mean") :+
        round(col("ci_lo"), 6).as("ci_lo") :+
        round(col("ci_hi"), 6).as("ci_hi"): _*)
  }
}
