package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group time-series forecasting baselines — the "what do we expect
  * tomorrow?" readout a monitoring pipeline pairs with its anomaly gates
  * (q_cusum flags a shift AFTER it happens; a forecast is what the shift is
  * measured against).
  *
  * Holt's linear (double-exponential) smoothing: level
  * `l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})`, trend
  * `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`, one-step forecast
  * `x̂_{t+1} = l_t + b_t` (Holt 1957). A genuine nonlinear recursion — like
  * [[ChangeDetect.cusum]] it cannot be a window function, so it folds per
  * group over the PRE-AGGREGATED daily series.
  *
  * Scale shape (100 TB): raw rows cross the shuffle once as map-side-combined
  * DECIMAL daily sums; the fold runs on |groups| × |days| rows via
  * `mapPartitions` after a group repartition + intra-partition sort, each
  * group's state two doubles. The fold order is the day order — fixed — so
  * results are bit-identical across partitionings and the DuckDB
  * recursive-CTE oracle replays it exactly. α/β default to exact
  * binary-representable constants (0.5, 0.25) so each step's arithmetic has
  * one rounding per operation on both engines.
  */
object Forecast {

  /** Holt linear smoothing per group over a (group, day, value) daily
    * aggregate (`valueCol` DECIMAL — cast to double once at the fold input).
    * Init: l₂ = x₂, b₂ = x₂ − x₁; the fold and the one-step-ahead absolute
    * errors start at t = 3. Groups with < 3 days are dropped (no error to
    * measure). Output per group: (group, n_days, level, trend,
    * forecast_next, mae) — `level`/`trend` the final state, `forecast_next`
    * = level + trend, `mae` the mean |x_t − (l_{t−1}+b_{t−1})| over t ≥ 3.
    */
  def holtLinear(df: DataFrame, groupCol: String, dayCol: String,
                 valueCol: String, alpha: Double = 0.5,
                 beta: Double = 0.25): DataFrame = {
    val z = df.select(col(groupCol).as("g"), col(dayCol).cast("date").as("d"),
      col(valueCol).cast("double").as("x"))

    val schema = StructType(Seq(
      StructField("g", z.schema("g").dataType),
      StructField("n_days", LongType, nullable = false),
      StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false),
      StructField("forecast_next", DoubleType, nullable = false),
      StructField("mae", DoubleType, nullable = false)))
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)

    z.repartition(col("g"))
      .sortWithinPartitions(col("g"), col("d"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var g: Any = null
        var started = false
        var n = 0L; var x1 = 0.0
        var l = 0.0; var b = 0.0; var sae = 0.0
        def flush(): Unit = if (started && n >= 3) {
          out += Row(g, n, l, b, l + b, sae / (n - 2))
        }
        it.foreach { r =>
          val rg = r.get(0)
          if (!started || rg != g) {
            flush(); g = rg; started = true
            n = 0L; x1 = 0.0; l = 0.0; b = 0.0; sae = 0.0
          }
          val x = r.getDouble(2)
          n += 1
          if (n == 1) x1 = x
          else if (n == 2) { l = x; b = x - x1 }
          else {
            // operation order matches the oracle's recursive CTE term by term
            val f = l + b
            sae += math.abs(x - f)
            val lNew = alpha * x + (1.0 - alpha) * f
            b = beta * (lNew - l) + (1.0 - beta) * b
            l = lNew
          }
        }
        flush()
        out.iterator
      }(enc)
      .toDF(groupCol, "n_days", "level", "trend", "forecast_next", "mae")
  }

  /** Naive-baseline backtest — the sanity floor every forecast must beat
    * (M-competition discipline): one-step error of naive-1 (yesterday's
    * value) vs seasonal naive-7 (same weekday last week), and their ratio
    * MASE₇ = MAE₇/MAE₁ (< 1 ⇔ the weekly pattern genuinely helps). A model
    * (Holt, seasonal baseline) that can't beat these numbers is decoration.
    *
    * `xExactCol` must be integer-valued DECIMAL daily values (micro units).
    * Lag alignment is the [[Series.acf]] calendar equi-join — never a
    * per-group unpartitioned window. |errors| sum exactly in DECIMAL; each
    * MAE is one division, reported in micro units (caller rescales).
    *
    * Output per group asc: (group, n1, mae_naive1, n7, mae_naive7, mase7).
    */
  def naiveBacktest(daily: DataFrame, groupCol: String, dayCol: String,
                    xExactCol: String): DataFrame = {
    val d = daily.select(col(groupCol).as("g"), col(dayCol).as("d"),
      col(xExactCol).cast("decimal(19,0)").as("x"))
    def lagErr(lag: Int, nName: String, sName: String): DataFrame = {
      val shifted = d.select(col("g"), date_add(col("d"), lag).as("d"),
        col("x").as("xl"))
      d.join(shifted, Seq("g", "d"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as(nName),
          sum(abs(col("x") - col("xl"))).as(sName))
    }
    lagErr(1, "n1", "s1").join(lagErr(7, "n7", "s7"), Seq("g"))
      .select(col("g").as(groupCol), col("n1"),
        (col("s1").cast("double") / col("n1")).as("mae_naive1"),
        col("n7"),
        (col("s7").cast("double") / col("n7")).as("mae_naive7"),
        ((col("s7").cast("double") / col("n7")) /
          (col("s1").cast("double") / col("n1"))).as("mase7"))
      .orderBy(col(groupCol))
  }
}
