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
    // catalog size folded in as a broadcast 1-row aggregate — single job, no eager action
    val catSize = catalog.agg(countDistinct(col(catalogItemCol)).cast("double").as("__cat"))
    events.groupBy(unix_timestamp(date_trunc("hour", col(tsCol))).as("window_start"))
      .agg(countDistinct(col(itemCol)).as("n_items"))
      .crossJoin(broadcast(catSize))
      .withColumn("coverage", round(col("n_items") / col("__cat"), 6))
      .drop("__cat")
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

  /** Skew-guarded sessionize: identical output to [[sessionize]], but no single
    * window partition ever holds more than one user's events for one time chunk.
    *
    * [[sessionize]]'s `partitionBy(user)` window serializes ALL of a user's events
    * into one task — a whale user (bot traffic) with 10⁸ events stalls the stage.
    * Here events are sessionized within (user, chunk) partitions first (parallel
    * across chunks of the same user), then chunk-local sessions whose boundary gap
    * is ≤ the session gap are merged in a second window pass over the per-chunk
    * SESSION list — orders of magnitude smaller than the event list for dense
    * (bot-like) traffic, which is exactly the skew case.
    *
    * `chunk` is any `date_trunc` unit ("day", "hour"); chunks are disjoint time
    * ranges, so chunk-local sessions never interleave across chunks and the merge
    * is a linear scan per user. A session chain spanning many chunks merges
    * transitively via the running sum.
    */
  def sessionizeChunked(events: DataFrame, userCol: String = "user_id",
                        tsCol: String = "ts", gapMinutes: Int = 30,
                        chunk: String = "day"): DataFrame = {
    val gapMs = gapMinutes * 60000L
    val e = events.select(col(userCol), unix_millis(col(tsCol)).as("__ms"),
      date_trunc(chunk, col(tsCol)).as("__chunk"))
    // phase 1: sessions within (user, chunk) — bounded partitions, parallel
    val byChunk = Window.partitionBy(col(userCol), col("__chunk")).orderBy(col("__ms"))
    val prevMs = lag(col("__ms"), 1).over(byChunk)
    val localNew = when(prevMs.isNull || col("__ms") - prevMs > gapMs, 1L).otherwise(0L)
    val local = e
      .withColumn("__sid", sum(localNew)
        .over(byChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__chunk"), col("__sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__ms")).as("start_ms"), max(col("__ms")).as("end_ms"))
    // phase 2: merge boundary-adjacent chunk-local sessions (rows = sessions, not events)
    val byUser = Window.partitionBy(col(userCol)).orderBy(col("start_ms"), col("end_ms"))
    val prevEnd = lag(col("end_ms"), 1).over(byUser)
    val mergedNew = when(prevEnd.isNull || col("start_ms") - prevEnd > gapMs, 1L).otherwise(0L)
    local
      .withColumn("session_id", sum(mergedNew)
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(sum(col("n_events")).as("n_events"),
        min(col("start_ms")).as("start_ms"), max(col("end_ms")).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
  }

  /** Top-N session paths: the most common event-type sequences within gap-based
    * sessions — the path-mining view of the funnel ("view>click>purchase" vs
    * "view>error>view"). Sessions are assigned with the same user-keyed gap
    * window as [[sessionize]]; each session's path is assembled by sorting the
    * collected (ts, tiebreak, type) structs INSIDE the aggregate (sort_array
    * makes collect_list's arrival order irrelevant — deterministic under any
    * partitioning), and the final cut is orderBy.limit, never a global sort of
    * the path table. Session length bounds the collected array, so memory per
    * group is session-bounded, not corpus-bounded.
    * Output: (path, n_sessions), topN rows by count desc then path.
    */
  def topSessionPaths(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts", typeCol: String = "event_type",
                      idCol: String = "event_id", gapMinutes: Int = 30,
                      topN: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val epochMs = unix_millis(col(tsCol))
    val prev = lag(epochMs, 1).over(byUser)
    val isNew = when(prev.isNull || epochMs - prev > gapMinutes * 60000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__sid", sum(isNew)
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sid"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(epochMs.as("ms"),
            col(idCol).as("tb"), col(typeCol).as("et")))),
          x => x.getField("et")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
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
