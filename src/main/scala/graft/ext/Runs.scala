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
}
