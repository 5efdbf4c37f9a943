package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequential change detection over grouped time series — the monitoring gate
  * a pipeline runs on per-feed daily volume before a corpus drop: "did this
  * feed's level shift upward, and when?".
  *
  * One-sided CUSUM (Page 1954): standardize each group's series to z-scores,
  * then fold `s_t = max(0, s_{t-1} + z_t − k)`; an alarm fires while
  * `s_t > h`. The fold is a genuine nonlinear recursion — not expressible as
  * a window function — so it runs per group over the PRE-AGGREGATED series.
  *
  * Scale shape (100 TB): raw rows cross the shuffle once, as map-side-combined
  * DECIMAL partial sums keyed by (group, day); the recursive fold then runs on
  * |groups| × |days| aggregate rows via `flatMapGroups`, each group's state a
  * single double. Group moments use exact DECIMAL sums (order-independent),
  * and the per-day fold is sequential by construction — bit-identical across
  * partitionings, so the DuckDB recursive-CTE oracle reproduces it exactly.
  */
object ChangeDetect {

  /** Per-group one-sided CUSUM over a (groupCol, dayCol, valueDec) daily
    * aggregate. `df` must already be one row per (group, day) with `value` a
    * DECIMAL column (exact); returns one row per group:
    * (group, n_days, max_s, peak_day, n_alarms).
    */
  def cusum(df: DataFrame, groupCol: String, dayCol: String,
            valueCol: String, k: Double, h: Double): DataFrame = {
    val spark = df.sparkSession
    val moments = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol)).as("__s"),
        sum(col(valueCol) * col(valueCol)).as("__s2"))
      .select(col(groupCol),
        (col("__s").cast("double") / col("__n")).as("__mean"),
        sqrt(greatest(
          col("__s2").cast("double") / col("__n") -
            (col("__s").cast("double") / col("__n")) *
            (col("__s").cast("double") / col("__n")),
          lit(0.0))).as("__sd"))

    val z = df.join(moments, groupCol)
      .select(col(groupCol).as("g"), col(dayCol).cast("date").as("d"),
        ((col(valueCol).cast("double") - col("__mean")) /
          when(col("__sd") > 0.0, col("__sd")).otherwise(lit(1.0))).as("z"))

    val schema = StructType(Seq(
      StructField("g", z.schema("g").dataType),
      StructField("n_days", LongType, nullable = false),
      StructField("max_s", DoubleType, nullable = false),
      StructField("peak_day", DateType),
      StructField("n_alarms", LongType, nullable = false)))
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)

    z.repartition(col("g"))
      .sortWithinPartitions(col("g"), col("d"))
      .mapPartitions { it =>
        // rows arrive clustered by group, ordered by day within each group
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var g: Any = null
        var started = false
        var s = 0.0; var maxS = 0.0; var peak: java.sql.Date = null
        var n = 0L; var alarms = 0L
        def flush(): Unit = if (started) {
          out += Row(g, n, maxS, peak, alarms)
        }
        it.foreach { r =>
          val rg = r.get(0)
          if (!started || rg != g) {
            flush(); g = rg; started = true
            s = 0.0; maxS = 0.0; peak = null; n = 0L; alarms = 0L
          }
          // left-assoc (s + z) - k matches the oracle's `s + z - k` exactly
          s = math.max(0.0, s + r.getDouble(2) - k)
          n += 1
          if (s > maxS) { maxS = s; peak = r.getDate(1) }
          if (s > h) alarms += 1
        }
        flush()
        out.iterator
      }(enc)
      .toDF(groupCol, "n_days", "max_s", "peak_day", "n_alarms")
  }

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975) per group over a
    * (group, day, value) daily aggregate — the nonparametric "is this feed
    * trending?" gate: S = Σ_{i<j} sign(v_j − v_i) over day-ordered pairs,
    * tie-corrected variance
    * `Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18` (t = size of each
    * tied-value group), and the continuity-corrected
    * `z = (S ∓ 1)/√Var(S)` (0 when S = 0). Distribution-free: no normality
    * or linearity assumption, robust to outliers — the standard companion to
    * the Theil–Sen slope (q_theil_sen) for monotone-trend detection.
    *
    * `df` must be one row per (group, day) with `valueCol` DECIMAL (exact), so
    * the pairwise sign comparisons are unambiguous across engines. Scale
    * shape: the pair join runs on the PRE-AGGREGATED daily rows — O(days²)
    * per group on a bounded calendar span (a 3-year daily feed is 1096 rows →
    * 600k pairs per group, map-side work), never on raw events; S and the tie
    * counts are exact integers, floats enter only in the final z. Output per
    * group: (group, n_days, s_stat, var_s, z_stat, trend), doubles rounded
    * half-up to 6 decimals.
    */
  def mannKendall(df: DataFrame, groupCol: String, dayCol: String,
                  valueCol: String, zCrit: Double = 1.96): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(dayCol).as("d"),
      col(valueCol).as("v"))
    val s = base.as("a").join(base.as("b"),
        col("a.g") === col("b.g") && col("a.d") < col("b.d"))
      .groupBy(col("a.g").as("g"))
      .agg(sum(signum(col("b.v") - col("a.v")).cast("long")).as("s_stat"))
    val ties = base.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("__ndistinct"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_term"))
    val n = base.groupBy(col("g")).agg(count(lit(1)).as("n_days"))
    n.join(s, "g").join(ties, "g")
      .withColumn("var_s",
        (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5) -
          col("tie_term")).cast("double") / 18.0)
      .withColumn("z_stat",
        when(col("s_stat") > 0, (col("s_stat") - 1) / sqrt(col("var_s")))
          .when(col("s_stat") < 0, (col("s_stat") + 1) / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
      .select(col("g").as(groupCol), col("n_days"), col("s_stat"),
        round(col("var_s"), 6).as("var_s"),
        round(col("z_stat"), 6).as("z_stat"),
        when(col("z_stat") > zCrit, lit("increasing"))
          .when(col("z_stat") < -zCrit, lit("decreasing"))
          .otherwise(lit("none")).as("trend"))
  }

  /** Optimal single changepoint per group — the first step of binary
    * segmentation (Scott & Knott 1974): the split k that maximizes the
    * between-segment sum of squares `P_k²/k + (S−P_k)²/(n−k)` over the
    * day-ordered prefix sums, i.e. the retrospective "WHERE did the level
    * shift?" answer ([[cusum]] is the sequential "did it shift yet?" alarm,
    * [[mannKendall]] the monotone-trend test — this pins the breakpoint).
    *
    * `df` must be one row per (group, day) with `valueCol` DECIMAL so the
    * prefix sums are exact; every score input (P_k, k, S, n) is exact, the
    * score itself is a fixed sequence of IEEE mul/div/add on those exact
    * inputs — bit-identical across engines and partition orders without any
    * rounding step, so the argmax (ties → earliest day) is stable. The
    * prefix window partitions by group (parallel across groups; a group's
    * daily series is calendar-bounded). Output per group:
    * (group, n_days, split_day, n_left, mean_left, mean_right, shift) with
    * means in `unitScale`-divided units rounded half-up to 6 decimals.
    */
  def bestSplit(df: DataFrame, groupCol: String, dayCol: String,
                valueCol: String, unitScale: Double = 1.0): DataFrame = {
    val w = Window.partitionBy(col("__g")).orderBy(col("__d"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.select(col(groupCol).as("__g"), col(dayCol).as("__d"),
        col(valueCol).as("__v"))
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__p", sum(col("__v")).over(cum))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
      .withColumn("__s", sum(col("__v")).over(Window.partitionBy(col("__g"))))
      .filter(col("__k") < col("__n")) // split AFTER day k; k = n is no split
    val p = col("__p").cast("double")
    val s = col("__s").cast("double")
    val score = p * p / col("__k") +
      (s - p) * (s - p) / (col("__n") - col("__k"))
    val ranked = base.withColumn("__score", score)
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__g"))
          .orderBy(col("__score").desc, col("__d"))))
      .filter(col("__r") === 1)
    ranked.select(col("__g").as(groupCol), col("__n").as("n_days"),
      col("__d").as("split_day"), col("__k").as("n_left"),
      round(p / col("__k") / unitScale, 6).as("mean_left"),
      round((s - p) / (col("__n") - col("__k")) / unitScale, 6)
        .as("mean_right"),
      round((s - p) / (col("__n") - col("__k")) / unitScale -
        p / col("__k") / unitScale, 6).as("shift"))
  }
}
