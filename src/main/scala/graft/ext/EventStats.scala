package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral statistics over event streams — the monitoring layer of a
  * training-data pipeline (ingest anomalies, bot detection, behavioral
  * diversity). All three operators are pure keyed window/aggregate plans:
  * no global windows, no driver-side state, partition keys chosen so 1000
  * executors each see a bounded slice (event_type × day is small; user_id is
  * the natural high-cardinality shard key).
  */
object EventStats {

  /** Trailing-window anomaly detection on daily volumes per event type.
    * Each (event_type, day) row is scored against the mean/stddev of the
    * PRECEDING `baselineDays` days (current day excluded — an anomalous day
    * must not defend itself by inflating its own baseline); days with fewer
    * than `minBaseline` preceding observations get a null z-score rather than
    * a misleading one. Output: (event_type, day, n_events, baseline_mean,
    * baseline_std, z, is_anomaly = |z| > threshold).
    *
    * Scale shape: the aggregate shrinks events to |types|×|days| rows, then the
    * window runs per event_type — thousands of independent partitions, each a
    * short time series. stddev_samp follows the same definition in DuckDB.
    */
  def dailyAnomalies(events: DataFrame, tsCol: String, typeCol: String,
                     baselineDays: Int = 7, minBaseline: Int = 3,
                     threshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-baselineDays, -1)
    daily
      .withColumn("baseline_n", count(col("n_events")).over(w))
      .withColumn("baseline_mean", avg(col("n_events")).over(w))
      .withColumn("baseline_std", stddev_samp(col("n_events")).over(w))
      .withColumn("z",
        when(col("baseline_n") >= minBaseline && col("baseline_std") > 0,
          (col("n_events") - col("baseline_mean")) / col("baseline_std")))
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("baseline_mean"), 6).as("baseline_mean"),
        round(col("baseline_std"), 6).as("baseline_std"),
        round(col("z"), 6).as("z"),
        (abs(col("z")) > threshold).as("is_anomaly"))
  }

  /** Exponentially-weighted moving average of daily volumes per event type —
    * the smoothed baseline curve behind alerting dashboards and trend
    * normalization. For each (event_type, day): ewma = Σ_s w_s·n_s / Σ_s w_s
    * over the trailing `windowDays` days with weight w_s = decay^(Δdays) —
    * pandas `ewm(adjust=True)` semantics restricted to a bounded window, so
    * the weights are an explicit finite sum instead of an unbounded
    * recurrence (which no SQL window computes and whose infinite tail decays
    * below double precision past the bound anyway; decay 0.9^28 ≈ 0.05).
    *
    * Scale shape: events aggregate to |types|×|days| rows FIRST; the trailing
    * window is then a bounded-fan-out (≤ `windowDays`×) self-join on the tiny
    * aggregated series, keyed by event_type — never a join on raw events.
    * Weighted sums ride DECIMAL so partition order can't flip low bits.
    * Output: (event_type, day, n_events, ewma).
    */
  def ewmaDaily(events: DataFrame, tsCol: String, typeCol: String,
                decay: Double = 0.9, windowDays: Int = 28): DataFrame = {
    val daily = events
      .select(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n_events"))
    val t = daily.as("t")
    val s = daily.select(col("event_type"), col("day").as("sday"),
      col("n_events").as("sn")).as("s")
    t.join(s, col("t.event_type") === col("s.event_type") &&
        datediff(col("t.day"), col("sday")).between(0, windowDays - 1))
      .select(col("t.event_type").as("event_type"), col("t.day").as("day"),
        col("t.n_events").as("n_events"),
        pow(lit(decay), datediff(col("t.day"), col("sday"))).as("w"),
        col("sn"))
      .groupBy(col("event_type"), col("day"), col("n_events"))
      .agg((sum((col("sn") * col("w")).cast("decimal(27,12)")).cast("double") /
        sum(col("w").cast("decimal(27,12)")).cast("double")).as("ewma"))
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("ewma"), 6).as("ewma"))
  }

  /** Per-user inter-arrival burstiness (Goh & Barabási 2008): with gap mean μ
    * and sample stddev σ, B = (σ−μ)/(σ+μ) ∈ (−1, 1) — 0 for a Poisson
    * process, → 1 for heavy bursts, → −1 for a metronome. Bot traffic shows
    * up as extreme B with tiny μ. Users need at least `minEvents` events
    * (`minEvents − 1` gaps ≥ 2, so σ is defined).
    * Output: (user_id, n_events, mean_gap_s, std_gap_s, burstiness).
    *
    * Gaps are computed in epoch SECONDS (double) so both engines do identical
    * float arithmetic off an exact integer millisecond base.
    */
  def burstiness(events: DataFrame, tsCol: String, userCol: String,
                 minEvents: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val gaps = events
      .select(col(userCol).as("user_id"),
        (unix_millis(col(tsCol))).as("ms"), col("event_id"))
      .withColumn("gap_ms", col("ms") - lag(col("ms"), 1).over(w))
      .withColumn("gap_s", col("gap_ms") / 1000.0)
      .filter(col("gap_s").isNotNull)
    // the mean gap is a RATIONAL (integer ms sum / 1000n) — AVG's double
    // accumulation puts user means like 32118.7978625 exactly on the 6-dp
    // round boundary where engine summation order flips the last digit
    // (sf0.1 value-hash catch, r16); round it in exact integer space
    // (the q_price_pctrank recipe). sigma and burstiness keep the double
    // path — they are not rationals and both engines agree on them.
    gaps.groupBy(col("user_id"))
      .agg((count(lit(1)) + 1).as("n_events"),
        sum(col("gap_ms")).as("__sms"), count(lit(1)).as("__ng"),
        avg(col("gap_s")).as("mu"), stddev_samp(col("gap_s")).as("sigma"))
      .filter(col("n_events") >= minEvents)
      .select(col("user_id"), col("n_events"),
        (expr("(2 * __sms * 1000000 + 1000 * __ng) div (2000 * __ng)")
          .cast("double") / 1e6).as("mean_gap_s"),
        round(col("sigma"), 6).as("std_gap_s"),
        round((col("sigma") - col("mu")) / (col("sigma") + col("mu")), 6)
          .as("burstiness"))
  }

  /** Shannon entropy (bits) of each user's event-type distribution — the
    * behavioral-diversity score (0 = monomaniac, log2 |types| = uniform).
    * Output: (user_id, n_events, n_types, entropy_bits).
    *
    * The per-type terms −p·log2(p) accumulate through DECIMAL(18,8) so the
    * per-user sum is partition-order-independent; log2 is expressed as
    * ln/ln2 with an embedded ln2 literal both engines parse identically.
    */
  def userTypeEntropy(events: DataFrame, userCol: String, typeCol: String): DataFrame = {
    val ln2 = 0.6931471805599453
    val c = events.select(col(userCol).as("user_id"), col(typeCol).as("t"))
      .groupBy(col("user_id"), col("t")).agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("user_id"))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("n_types"))
    c.join(tot, Seq("user_id"))
      .select(col("user_id"), col("tot"), col("n_types"),
        (-(col("n") / col("tot").cast("double")) *
          log(col("n") / col("tot").cast("double")) / lit(ln2))
          .cast("decimal(18,8)").as("term"))
      .groupBy(col("user_id"))
      .agg(max(col("tot")).as("n_events"), max(col("n_types")).as("n_types"),
        // Round in the DECIMAL domain (exact half-up on the 8-dp sum), then
        // convert: rounding a converted double instead would let a 1-ulp
        // engine difference at a x.xxxxxx50 sum flip the 6th decimal.
        round(sum(col("term")), 6).cast("double").as("entropy_bits"))
  }

  /** Weekly-seasonal anomaly detection: each (event_type, day) volume scored
    * against the exact MEDIAN volume of the same ISO day-of-week for that
    * type — the robust seasonal baseline that [[dailyAnomalies]]' trailing
    * mean can't give (a Monday spike is only anomalous relative to other
    * Mondays). The median includes the scored day itself: with a handful of
    * weeks per dow a leave-one-out median doubles the work for little
    * robustness gain (one outlier barely moves a median), and the inclusion
    * only ever DAMPS the flag — conservative in the safe direction.
    *
    * The daily aggregate bounds everything downstream at |types| × |days|
    * rows; the per-(type, dow) exact percentile runs over ≤ |weeks| values a
    * group. Output: (event_type, day, dow, n_events, n_weeks, dow_median,
    * ratio, is_anomaly = ratio outside [lo, hi]).
    */
  def seasonalAnomalies(events: DataFrame, tsCol: String, typeCol: String,
                        hi: Double = 1.5, lo: Double = 0.5): DataFrame = {
    val d = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dow", (weekday(col("day")) + lit(1)).cast("long"))
    val m = d.groupBy(col("event_type"), col("dow"))
      .agg(percentile(col("n_events"), lit(0.5)).as("dow_median"),
        count(lit(1)).as("n_weeks"))
    d.join(m, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("dow"), col("n_events"),
        col("n_weeks"), round(col("dow_median"), 6).as("dow_median"),
        round(col("n_events") / col("dow_median"), 6).as("ratio"),
        (col("n_events") > lit(hi) * col("dow_median") ||
          col("n_events") < lit(lo) * col("dow_median")).as("is_anomaly"))
  }

  /** Theil-Sen robust trend per event type: the median of all pairwise
    * day-to-day slopes over daily volumes (plus the median-residual
    * intercept). One anomalous day drags an OLS line; the median slope needs
    * >29% of days corrupted to move — the trend line a volume monitor should
    * alarm on. The pairwise O(days²) join runs on the DAILY AGGREGATE — a
    * calendar-bounded table, so ~500k pairs per type per decade at any
    * corpus size. Output: (event_type, n_days, slope_per_day, intercept).
    */
  def theilSenTrend(events: DataFrame, tsCol: String,
                    typeCol: String): DataFrame = {
    val d = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01").cast("date")))
    val p = d.as("a").join(d.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.x") < col("b.x"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.y") - col("a.y")).cast("double") / (col("b.x") - col("a.x")))
          .as("s"))
    val m = p.groupBy(col("event_type"))
      .agg(percentile(col("s"), lit(0.5)).as("slope"))
    d.join(m, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), max(col("slope")).as("slope"),
        percentile(col("y") - col("slope") * col("x"), lit(0.5)).as("icept"))
      .select(col("event_type"), col("n_days"),
        round(col("slope"), 6).as("slope_per_day"),
        round(col("icept"), 6).as("intercept"))
  }

  /** Daily + trailing-`windowDays` rolling distinct active users (DAU/WAU).
    * Sliding-window COUNT DISTINCT doesn't decompose over a window frame, so
    * the standard distributed shape is contribution-explode: each distinct
    * (user, day) row fans out to the `windowDays` window positions it
    * contributes to, and the count is a plain keyed distinct-aggregate per
    * window day — shuffle volume `windowDays ×` the (user, day) table, never
    * a per-day rescan. Days beyond the observed range are clipped with a
    * broadcast 1-row max. Output: (day, dau, wau) per observed day.
    */
  def rollingActiveUsers(events: DataFrame, tsCol: String, userCol: String,
                         windowDays: Int = 7): DataFrame = {
    val ud = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val maxDay = ud.agg(max(col("d")).as("max_d"))
    val contrib = ud
      .select(col("u"), explode(sequence(col("d"),
        date_add(col("d"), windowDays - 1))).as("day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("max_d"))
      .select(col("u"), col("day")).distinct()
    val wau = contrib.groupBy(col("day")).agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    // report observed days only (a window day with no direct activity still
    // has trailing actives, but the DAU spine is the product surface)
    dau.join(wau, Seq("day")).select(col("day"), col("dau"), col("wau"))
  }

  /** Rolling active users via mergeable HLL sketches — the 100 TB twin of
    * [[rollingActiveUsers]]. The exact path explodes each (user, day) into
    * every window it serves (windowDays× the distinct volume, then a
    * COUNT DISTINCT per window); the sketch path aggregates raw events ONCE
    * into a per-day HLL (map-side partial, bytes per day) and every window
    * after that is a UNION OF SKETCHES over `windowDays` rows — no second
    * pass over users, no explode, window cost independent of cardinality.
    * The trade is the HLL's ~1.6% standard error (lgConfigK = 12 default),
    * and that sketches admit ANY downstream rollup (weekly, monthly, ad-hoc
    * ranges) from the same daily aggregates — the reason warehouses
    * materialize sketch columns, not counts.
    *
    * Output: (day, dau_est, wau_est) — both HLL estimates (long-rounded, as
    * `hll_sketch_estimate` reports), the daily one checkable against the
    * exact DAU in specs.
    */
  def rollingActiveUsersSketch(events: DataFrame, tsCol: String, userCol: String,
                               windowDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("u"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("u")).as("sk"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    // NOTE the rows-frame approximation: like the exact operator, only
    // observed days appear; unlike it, a GAP in the day spine lets the frame
    // reach further back than windowDays calendar days. Densify the spine
    // first when that matters (the events table has no gaps at test SFs).
    daily
      .withColumn("dau_est", hll_sketch_estimate(col("sk")))
      .withColumn("wau_est", hll_sketch_estimate(hll_union_agg(col("sk")).over(w)))
      .select(col("day"), col("dau_est"), col("wau_est"))
  }

  /** Interval concurrency by event sweep — "how many intervals are open on
    * each day, and when does each month peak?": the classic +1/−1 boundary
    * trick (start day adds one, day AFTER the inclusive end subtracts one),
    * net deltas aggregated per DAY, then one cumulative sum over the
    * day-grain table. The sweep turns an O(n·span) interval×day join into
    * one scan + a bounded-series window: per-day deltas are a date-keyed
    * aggregate (thousands of rows at any corpus scale — the ScaleGuard-
    * exempt shape), and no interval is ever exploded across its span.
    *
    * Output per month asc: (month 'yyyy-MM', max_open, peak_day = first
    * day attaining the max). Intervals with end < start raise (a sweep
    * would silently go negative). NOTE: months appear only if some interval
    * BOUNDARY falls in them — a month fully inside one long interval is
    * absent (its open count is the carried level, visible in the
    * neighboring months); densify the day spine first when that matters.
    */
  def intervalConcurrency(intervals: DataFrame, startCol: String,
                          endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val checked = intervals.select(
      to_date(col(startCol)).as("__s"),
      when(to_date(col(endCol)) >= to_date(col(startCol)),
        to_date(col(endCol)))
        .otherwise(raise_error(concat(lit("interval ends before start: "),
          col(startCol).cast("string"), lit(" > "),
          col(endCol).cast("string")))).as("__e"))
    val deltas = checked
      .select(explode(array(
        struct(col("__s").as("day"), lit(1L).as("d")),
        struct(date_add(col("__e"), 1).as("day"), lit(-1L).as("d")))).as("ev"))
      .select(col("ev.day").as("day"), col("ev.d").as("d"))
      .groupBy(col("day")).agg(sum(col("d")).as("net"))
    val open = deltas.withColumn("open",
      sum(col("net")).over(Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    open
      .select(date_format(col("day"), "yyyy-MM").as("month"), col("day"),
        col("open"))
      .groupBy(col("month"))
      .agg(min(struct((-col("open")).as("nego"), col("day").as("day"),
        col("open").as("open"))).as("__b"))
      .select(col("month"), col("__b.open").as("max_open"),
        col("__b.day").as("peak_day"))
      .orderBy(col("month"))
  }

  /** PERSISTENT-ITEMS audit (Dai et al., "Finding persistent items in data
    * streams", VLDB 2016 — the observation that PERSISTENCE, the number of
    * distinct time windows an entity appears in, separates steady
    * low-volume actors from bursty heavy hitters, and no frequency sketch
    * can read it): classify entities into the four
    * persistence × intensity quadrants and summarize each. Loyal-but-
    * light customers, periodic scrapers, one-burst spam — all invisible
    * to a pure count ranking.
    *
    * Per entity: windows_active = distinct windows touched, n_events;
    * persistence = windows_active / total_windows; intensity = events
    * per ACTIVE window. Quadrants split at `persistMin` (persistence,
    * inclusive) and `perWindowMin` (intensity via the exact integer
    * comparison n_events ≥ perWindowMin·windows_active — no float
    * threshold). Output per quadrant, ordered: (quadrant, n_entities,
    * n_events, avg_persistence, avg_per_window) with each average ONE
    * double division of exact integer sums.
    *
    * Scale shape: one (entity, window) distinct-grain aggregate (map-side
    * combinable), one entity-keyed rollup, a 1-row broadcast window
    * count, and a 4-group summary — no joins beyond the broadcast.
    */
  def persistenceQuadrants(df: DataFrame, entityCol: Column,
                           windowCol: Column, persistMin: Double,
                           perWindowMin: Int): DataFrame = {
    require(persistMin > 0 && persistMin < 1, s"bad persistMin $persistMin")
    require(perWindowMin >= 1, s"bad perWindowMin $perWindowMin")
    // persistMin as an exact rational over 100 so the quadrant split is an
    // integer cross-multiplication in both engines
    val pm = math.round(persistMin * 100).toInt
    val grain = df.select(entityCol.as("ent"), windowCol.as("win"))
    val perEnt = grain.groupBy(col("ent"), col("win"))
      .agg(count(lit(1)).as("n_in_win"))
      .groupBy(col("ent"))
      .agg(count(lit(1)).as("windows_active"),
        sum(col("n_in_win")).as("n_events"))
    val totalW = grain.select(col("win")).distinct()
      .agg(count(lit(1)).as("total_windows"))
    perEnt.crossJoin(broadcast(totalW))
      .select(col("ent"), col("windows_active"), col("n_events"),
        (col("windows_active") * 100 >= col("total_windows") * pm)
          .as("persistent"),
        (col("n_events") >= col("windows_active") * perWindowMin)
          .as("intense"),
        col("total_windows"))
      .groupBy(col("persistent"), col("intense"))
      .agg(count(lit(1)).as("n_entities"),
        sum(col("n_events")).as("n_events"),
        (sum(col("windows_active")).cast("double") /
          (count(lit(1)) * max(col("total_windows"))).cast("double"))
          .as("avg_persistence"),
        (sum(col("n_events")).cast("double") /
          sum(col("windows_active")).cast("double")).as("avg_per_window"))
      .select(
        concat(when(col("persistent"), lit("persistent"))
            .otherwise(lit("transient")), lit("_"),
          when(col("intense"), lit("heavy")).otherwise(lit("light")))
          .as("quadrant"),
        col("n_entities"), col("n_events"),
        round(col("avg_persistence"), 6).as("avg_persistence"),
        round(col("avg_per_window"), 6).as("avg_per_window"))
      .orderBy(col("quadrant"))
  }
}
