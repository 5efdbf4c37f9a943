package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the "analyze table" primitive a pipeline runs on every
  * new data drop before trusting it: per-column row/null/distinct counts and
  * min/max, in one scan, as a long-format table keyed by column name.
  */
object Profiling {

  /** Profile `cols` of `df` in ONE aggregation pass. Output, one row per
    * column: (column_name, n_rows, n_nulls, n_distinct, min_value, max_value) —
    * min/max cast to string so mixed-type columns share one schema.
    *
    * `exactDistinct = true` uses COUNT(DISTINCT): Spark plans the multi-distinct
    * aggregate via Expand, duplicating every input row once per profiled column
    * — exact, and fine up to mid-scale, but at 100 TB profile with
    * `exactDistinct = false` (HyperLogLog `approx_count_distinct`, single pass,
    * no Expand, ±~2.3% error) — the same switch [[graft.metrics.Coverage]]
    * exposes. The exact form is the oracle-checked one.
    */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))
    }
    row.select(explode(array(stacked: _*)).as("__p")).select(col("__p.*"))
  }

  /** Robust outlier detection via median/MAD (Iglewicz & Hoaglin's modified
    * z-score): with m = median(x) and MAD = median(|x − m|), flag rows where
    * |0.6745·(x − m)/MAD| > threshold (3.5 is the standard cut). Unlike
    * mean/stddev, the estimator doesn't let the outliers drag their own
    * baseline — one 1000× bad row barely moves a median.
    *
    * Output: flagged rows only — (id, value, median_value, mad, robust_z),
    * robust_z rounded 6, ordered by |z| desc then id for a stable artifact.
    *
    * Scale shape: the two medians are exact (`percentile`, a full-sort
    * aggregate) — right for the oracle-checked regime; at 100 TB switch
    * `exact = false` for `percentile_approx` (one-pass QuantileSummaries
    * sketch, no sort) and accept ±ε on the cut line. The 2-row scalar stage
    * broadcasts back over the scan, so the data never shuffles.
    */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
                  threshold: Double = 3.5, exact: Boolean = true): DataFrame = {
    val x = df.select(col(idCol).as("id"), col(valueCol).cast("double").as("value"))
    def med(c: org.apache.spark.sql.Column) =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(10000))
    val m = x.agg(med(col("value")).as("median_value"))
    val mad = x.crossJoin(broadcast(m))
      .agg(med(abs(col("value") - col("median_value"))).as("mad"))
    x.crossJoin(broadcast(m)).crossJoin(broadcast(mad))
      .withColumn("robust_z",
        lit(0.6745) * (col("value") - col("median_value")) / col("mad"))
      .filter(abs(col("robust_z")) > threshold)
      .select(col("id"), col("value"),
        round(col("median_value"), 6).as("median_value"),
        round(col("mad"), 6).as("mad"),
        round(col("robust_z"), 6).as("robust_z"))
  }

  /** Pairwise Pearson correlation of `cols` in ONE aggregation pass — all
    * `corr(ci, cj)` (i < j) computed as co-moments in the same map-side-partial
    * aggregate, then exploded to long format (col_a, col_b, corr). Pearson r is
    * scale-invariant, so sample-vs-population variance conventions cancel and the
    * result is engine-portable. One scan however many columns; the profiler
    * companion to [[profileColumns]].
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) => corr(col(a), col(b)).as(s"__c_${a}_$b") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__c_${a}_$b").as("pearson_r"))
    }
    row.select(explode(array(stacked: _*)).as("__p")).select(col("__p.*"))
  }
}
