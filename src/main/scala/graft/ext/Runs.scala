package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Runs-collapse ("gaps and islands") — the slowly-changing-dimension type-2
  * history build: collapse a per-key event stream into one row per maximal run
  * of consecutive equal values, with the run's validity interval.
  *
  * This is how a pipeline turns an attribute CHANGE LOG (user tier events,
  * document license re-crawls, item category edits) into the versioned
  * dimension a point-in-time join ([[AsOfJoin]]) consumes.
  *
  * Scale shape: one `partitionBy(key)` window pass to flag run starts (lag) and
  * number runs (running sum), one hash aggregate to collapse, one more per-key
  * window (lead) for the exclusive upper bound — all partitioned by key, no
  * global window, no self-join. Whale keys: a key's events sit in one task (the
  * same caveat as [[EventWindows.sessionize]]; the chunk-and-merge guard there
  * ports directly if a single key's history outgrows a task).
  */
object Runs {

  /** Collapse `df` to runs. Output per run:
    * (key, run_id, value, valid_from, valid_to, valid_until, n_events) where
    * `run_id` is 1-based per key in time order, `valid_from`/`valid_to` are the
    * first/last event times IN the run, and `valid_until` is the next run's
    * start (null for the key's current run — the open SCD2 interval).
    *
    * `tieCol` breaks equal-timestamp ties so run numbering is deterministic;
    * null values form runs like any other value (null-safe comparison).
    */
  def collapseRuns(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newRun = when(
      row_number().over(w) === 1 or
        !(col(valueCol) <=> lag(col(valueCol), 1).over(w)), 1L).otherwise(0L)
    val runs = df
      .select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("run_id", sum(newRun).over(cum))
      .groupBy(col(keyCol), col("run_id"))
      .agg(
        max(col(valueCol)).as("value"), // constant within a run
        min(col(tsCol)).as("valid_from"),
        max(col(tsCol)).as("valid_to"),
        count(lit(1)).as("n_events"))
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("run_id"))
    runs.withColumn("valid_until", lead(col("valid_from"), 1).over(wNext))
      .select(col(keyCol), col("run_id"), col("value"), col("valid_from"),
        col("valid_to"), col("valid_until"), col("n_events"))
  }

  /** Wald–Wolfowitz runs test per group over a (group, day, value) daily
    * aggregate — "are the above/below-mean days randomly interleaved, or do
    * they clump?": dichotomize each day against the group mean, count
    * maximal runs R of equal sign, and compare against the randomness null
    * E[R] = 1 + 2n₁n₂/n,
    * Var[R] = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)), z = (R − E[R])/√Var[R].
    * Too FEW runs = regime clumping (trend/level shifts); too many =
    * oscillation. The sequence-structure companion to [[graft.ext
    * .ChangeDetect.mannKendall]] (monotone trend) and q_cusum (level shift).
    *
    * The dichotomy is exact: `valueCol` must be DECIMAL, and a day is "up"
    * iff v·n > Σv in exact integer arithmetic — no double mean to skew a
    * borderline day across engines. Days exactly AT the mean are dropped
    * (the standard treatment). Scale shape: group-keyed aggregates and one
    * group-partitioned lag window over the bounded daily frame. Output per
    * group: (group, n_up, n_down, n_runs, e_runs, z_stat), doubles rounded
    * half-up to 6 decimals.
    */
  def runsTest(df: DataFrame, groupCol: String, dayCol: String,
               valueCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("__g"), col(dayCol).as("__d"),
      col(valueCol).as("__v"))
    val m = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__sv"))
    val signed = base.join(m, "__g")
      .withColumn("__sign",
        when(col("__v") * col("__n") > col("__sv"), lit(1))
          .when(col("__v") * col("__n") < col("__sv"), lit(-1)))
      .filter(col("__sign").isNotNull)
    val w = Window.partitionBy(col("__g")).orderBy(col("__d"))
    val counted = signed
      .withColumn("__new",
        when(lag(col("__sign"), 1).over(w).isNull or
          col("__sign") =!= lag(col("__sign"), 1).over(w), 1L).otherwise(0L))
      .groupBy(col("__g"))
      .agg(sum(when(col("__sign") === 1, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("__sign") === -1, 1L).otherwise(0L)).as("n_down"),
        sum(col("__new")).as("n_runs"))
    val n = (col("n_up") + col("n_down")).cast("double")
    val p2 = (col("n_up") * col("n_down") * 2).cast("double")
    val eR = lit(1.0) + p2 / n
    val varR = p2 * (p2 - n) / (n * n * (n - 1))
    counted.select(col("__g").as(groupCol), col("n_up"), col("n_down"),
      col("n_runs"),
      round(eR, 6).as("e_runs"),
      round((col("n_runs") - eR) /
        sqrt(when(varR > 0.0, varR).otherwise(lit(null))), 6).as("z_stat"))
  }
}
