package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-linear quantile histogram — the HdrHistogram / DDSketch bucket
  * family (Tene, HdrHistogram; Masson et al., "DDSketch", VLDB 2019):
  * values bucket by (octave, linear sub-bucket within the octave), giving a
  * RELATIVE-error guarantee of ~1/(2k) per estimate with a fixed ~64·k
  * bucket budget, fully mergeable (bucket counts add). Unlike equi-width
  * histograms the error doesn't blow up on long-tailed latency/size
  * distributions — which is exactly what corpus byte-size and latency
  * columns look like.
  *
  * The bucketing here is ALL-INTEGER — octave = length(bin(v)) − 1 (exact
  * floor-log2 with no floating log), sub-bucket and bounds by integer
  * division — so the sketch is bit-deterministic across engines and
  * partitionings; the only doubles are the final relative-error readouts.
  *
  * Scale shape: one map-side-combinable groupBy onto ≤ 64·k buckets; the
  * cumulative readout window runs over the bucket table (post-aggregation,
  * metadata-sized), never the data. The exact-rank audit side rides
  * [[GlobalRank.globalRowNumber]] — O(#partitions) driver scalars, no
  * unpartitioned data window.
  */
object HdrHistogram {

  /** Sketch-vs-exact quantile audit: for each integer percent, report the
    * sketch's bucket-midpoint estimate, the exact `ceil(p·n/100)`-th value
    * (percentile_disc), and the signed relative error. Values must be
    * ≥ 1 (rows below are dropped — log buckets need positive support).
    * Output: (pct, n, est, exact, rel_err), one row per percent.
    */
  def quantileAudit(df: DataFrame, valueCol: String, k: Int,
                    percents: Seq[Int]): DataFrame = {
    require(k >= 2 && k <= 256, s"k must be 2..256, got $k")
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be integers in 1..100, got $percents")
    val spark = df.sparkSession
    import spark.implicits._

    val vals = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v") >= 1)
    val buckets = vals
      .selectExpr("v", "CAST(length(bin(v)) - 1 AS BIGINT) AS e")
      .selectExpr("v", "e", "CAST(pow(2.0d, CAST(e AS DOUBLE)) AS BIGINT) AS p2")
      .selectExpr("e", s"((v - p2) * $k) div p2 AS sub")
      .groupBy(col("e"), col("sub")).agg(count(lit(1)).as("cnt"))
      .selectExpr("e", "sub", "cnt",
        "CAST(pow(2.0d, CAST(e AS DOUBLE)) AS BIGINT) AS p2")
      .selectExpr("e", "sub", "cnt",
        s"p2 + (sub * p2) div $k AS lo",
        s"p2 + ((sub + 1) * p2) div $k AS hi")
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("e"),
        col("sub")).rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val total = vals.agg(count(lit(1)).as("n"))
    val targets = broadcast(total.crossJoin(percents.toDF("pct"))
      .selectExpr("pct", "n", s"(n * pct + 99) div 100 AS target"))
    val est = buckets.join(targets,
        col("cum") >= col("target") && (col("cum") - col("cnt")) < col("target"))
      .selectExpr("pct", "n", "target", "(lo + hi) div 2 AS est")
    val ranked = GlobalRank.globalRowNumber(vals, Seq(col("v")))
    val exact = ranked.join(targets.select(col("pct").as("xpct"),
        col("target").as("xtarget")), col("rn") === col("xtarget"))
      .select(col("xpct"), col("v").as("exact"))
    est.join(exact, col("pct") === col("xpct"))
      .selectExpr("pct", "n", "est", "exact",
        "ROUND(CAST(est - exact AS DOUBLE) / CAST(exact AS DOUBLE), 6)" +
          " AS rel_err")
  }
}
