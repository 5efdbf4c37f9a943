package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delta-method standard error for RATIO metrics — the estimator every
  * experimentation platform needs for "revenue per order", "clicks per
  * session", "tokens per document": the metric is ΣX/ΣY over user-level
  * clusters, and naive per-row variance is wrong because rows within a user
  * are correlated. The delta method (Taylor-linearize X̄/Ȳ around the means;
  * Deng et al., KDD 2018 popularized it for A/B platforms) gives
  *
  *   Var(X̄/Ȳ) ≈ (1/(n·Ȳ²)) · (s²_X − 2·r̂·s_XY + r̂²·s²_Y),  r̂ = X̄/Ȳ
  *
  * with s² the (n−1)-denominator sample (co)variances over CLUSTER-level
  * totals. Sound as long as clusters are independent — exactly the
  * randomization unit of an experiment.
  *
  * Exactness: x is accumulated in DECIMAL cents and y as integer counts, so
  * the six moments (n, Σx, Σy, Σxy, Σx², Σy²) are partition-order-exact;
  * everything after is one fixed-order double formula mirrored verbatim in
  * the oracle SQL. Scale shape: one groupBy(cluster) over the scan, then one
  * groupBy(group) over the cluster table — both map-side combined; no
  * windows, no joins wider than the cluster aggregation.
  */
object RatioMetric {

  /** Per `groupCol`: the ratio Σx/Σy over clusters, its delta-method SE, and
    * the 95% normal CI. `xCents` must be an exact DECIMAL expression (e.g.
    * revenue cents), `yCount` an integer expression, both at `clusterCol`
    * grain after this function's internal aggregation.
    *
    * Output: (group, n_clusters, sum_x, sum_y, ratio, se, ci_lo, ci_hi).
    */
  def deltaMethodRatio(df: DataFrame, groupCol: String, clusterCol: String,
                       xCents: Column, yCount: Column): DataFrame = {
    val clusters = df
      .groupBy(col(groupCol).as("grp"), col(clusterCol).as("cl"))
      .agg(sum(xCents).cast("decimal(19,0)").as("x"),
        sum(yCount).cast("decimal(19,0)").as("y"))
    val m = clusters.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    // fixed-order double math over exact moments (oracle mirrors verbatim)
    val nD = col("n").cast("double")
    val xb = col("sx").cast("double") / nD
    val yb = col("sy").cast("double") / nD
    val r = col("sx").cast("double") / col("sy").cast("double")
    val vx = (col("sxx").cast("double") - nD * (xb * xb)) / (nD - 1)
    val vy = (col("syy").cast("double") - nD * (yb * yb)) / (nD - 1)
    val cxy = (col("sxy").cast("double") - nD * (xb * yb)) / (nD - 1)
    val se = sqrt((vx - lit(2.0) * r * cxy + (r * r) * vy) / (nD * (yb * yb)))
    m.filter(col("n") > 1)
      .select(col("grp").as(groupCol), col("n").as("n_clusters"),
        col("sx").cast("long").as("sum_x"),
        col("sy").cast("long").as("sum_y"),
        r.as("ratio"), se.as("se"),
        (r - lit(1.959963984540054) * se).as("ci_lo"),
        (r + lit(1.959963984540054) * se).as("ci_hi"))
  }
}
