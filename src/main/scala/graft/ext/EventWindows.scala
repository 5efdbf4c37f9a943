package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-time operators over the `events` table: tumbling-window aggregation,
  * gap-based sessionization, JSON property extraction. Extensions (the reference has
  * zero time semantics — SURVEY.md §1.1); the streaming variants live in
  * [[graft.streaming.StreamingOps]].
  */
object EventWindows {

  /** Tumbling hourly windows per event type. Window start is emitted as epoch seconds
    * (bigint) — portable across Spark/DuckDB timestamp flavors.
    */
  def hourlyStats(events: DataFrame, tsCol: String = "ts",
                  typeCol: String = "event_type", valCol: String = "value"): DataFrame = {
    // exact DECIMAL sum: double summation order differs across engines and can land
    // on a half-exact rounding boundary (43.4728125 → .813 vs .812 observed)
    val decSum = sum(col(valCol).cast("decimal(18,4)"))
    events.groupBy(
        unix_timestamp(date_trunc("hour", col(tsCol))).as("window_start"),
        col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        round(decSum.cast("double"), 6).as("sum_value"),
        round(decSum.cast("double") / count(lit(1)), 6).as("avg_value"))
  }

  /** Sliding event-time windows (batch): each event lands in width/slide overlapping
    * windows. Uses Spark's `window()` generator — the batch twin of
    * [[graft.streaming.StreamingOps.hourlyStats]].
    */
  def slidingStats(events: DataFrame, width: String = "1 hour",
                   slide: String = "30 minutes", tsCol: String = "ts",
                   typeCol: String = "event_type", valCol: String = "value"): DataFrame =
    events.groupBy(window(col(tsCol), width, slide).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valCol).cast("decimal(18,4)")).cast("double"), 6).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        unix_timestamp(col("w.end")).as("window_end"),
        col(typeCol), col("n_events"), col("sum_value"))

  /** Catalog coverage over time: per tumbling window, the fraction of the full item
    * catalog that appears in events — the event-time variant of
    * [[graft.metrics.Coverage]] (SURVEY.md §1.1 "coverage-over-time").
    */
  def coverageOverTime(events: DataFrame, catalog: DataFrame,
                       itemCol: String, catalogItemCol: String,
                       tsCol: String = "ts"): DataFrame = {
    val catalogSize = catalog.agg(countDistinct(col(catalogItemCol))).first().getLong(0)
    events.groupBy(unix_timestamp(date_trunc("hour", col(tsCol))).as("window_start"))
      .agg(countDistinct(col(itemCol)).as("n_items"))
      .withColumn("coverage", round(col("n_items") / lit(catalogSize.toDouble), 6))
  }

  /** Gap-based sessionization: a new session starts when a user's inter-event gap
    * exceeds `gapMinutes`. The window is partitioned by user — parallel across users,
    * no global sort (scale-safe; skew only if one user dominates).
    * Output: one row per session (user_id, session_id, n_events, start/end epoch,
    * duration_sec).
    */
  def sessionize(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val epochMs = unix_millis(col(tsCol))
    val prev = lag(epochMs, 1).over(byUser)
    val isNew = when(prev.isNull || epochMs - prev > gapMinutes * 60000L, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(epochMs).as("start_ms"),
        max(epochMs).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
  }

  /** Extract the integer `k` property from the JSON `props` string with a portable
    * regexp (identical semantics in DuckDB), aggregate per event type.
    */
  def propsStats(events: DataFrame, typeCol: String = "event_type",
                 propsCol: String = "props"): DataFrame = {
    val raw = regexp_extract(col(propsCol), "\"k\": (\\d+)", 1)
    val k = when(raw === "", lit(null)).otherwise(raw).cast("long")
    events.groupBy(col(typeCol))
      .agg(count(k).as("n_with_k"), sum(k).as("sum_k"),
        round(avg(k), 6).as("avg_k"), max(k).as("max_k"))
  }
}
