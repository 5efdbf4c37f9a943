package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution: credit each conversion's preceding
  * touchpoints under the three standard models (first-touch, last-touch,
  * linear) in one pass over the event log.
  *
  * The timeline trick: within each user's (ts, id)-ordered event stream, the
  * running count of conversions over PRECEDING-inclusive rows assigns every
  * event a segment number — touches carry the count itself, conversions carry
  * count − 1 — so a touch and the next conversion after it land in the SAME
  * segment. The touch→conversion mapping is then a plain (user, segment)
  * equi-join, 1:≤1 by construction (a segment holds at most one conversion):
  * no range join, no per-conversion scan, no explosion.
  *
  * Scale shape: one user-keyed window + one user-keyed equi-join + channel
  * roll-ups (the channel dimension is tiny). Whale users cost O(their events)
  * — linear, not quadratic; the same chunked-window guard as
  * [[EventWindows.sessionizeChunked]] applies if a single user's events
  * overflow a task.
  */
object Attribution {

  /** Credit per channel. Output: (channel, n_first_touch, n_last_touch,
    * linear_credit) — n_first/last count conversions whose first/last
    * qualifying touch was this channel; linear_credit splits each conversion
    * evenly across its qualifying touches (sums to the number of attributed
    * conversions). A touch qualifies when it precedes the conversion by at
    * most `lookbackMs` (and no other conversion intervenes). Conversions
    * with no qualifying touch are unattributed and appear in no row.
    */
  def channelCredit(events: DataFrame, tsCol: String, userCol: String,
                    typeCol: String, idCol: String,
                    touchTypes: Seq[String], convType: String,
                    lookbackMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSeg = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events
      .select(col(userCol).as("user_id"), unix_millis(col(tsCol)).as("ms"),
        col(idCol).as("event_id"), col(typeCol).as("channel"))
      .filter(col("channel").isin(touchTypes :+ convType: _*))
      .withColumn("cum",
        sum(when(col("channel") === convType, 1L).otherwise(0L)).over(wSeg))
      .withColumn("seg",
        when(col("channel") === convType, col("cum") - 1).otherwise(col("cum")))
    val touches = e.filter(col("channel") =!= convType)
      .select(col("user_id"), col("seg"), col("ms"), col("event_id"), col("channel"))
    val convs = e.filter(col("channel") === convType)
      .select(col("user_id"), col("seg"), col("ms").as("conv_ms"),
        col("event_id").as("conv_id"))
    val joined = touches.join(convs, Seq("user_id", "seg"))
      .filter(col("conv_ms") - col("ms") <= lookbackMs)
    val wConv = Window.partitionBy(col("user_id"), col("seg"))
      .orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val marked = joined
      .withColumn("n_touches", count(lit(1)).over(wConv))
      .withColumn("first_chan", first(col("channel")).over(wConv))
      .withColumn("last_chan", last(col("channel")).over(wConv))
    val linear = marked.groupBy(col("channel"))
      .agg(sum((lit(1.0) / col("n_touches")).cast("decimal(18,8)")).as("lin"))
    val perConv = marked
      .select(col("user_id"), col("conv_id"), col("first_chan"), col("last_chan"))
      .distinct()
    val firsts = perConv.groupBy(col("first_chan").as("channel"))
      .agg(count(lit(1)).as("n_first_touch"))
    val lasts = perConv.groupBy(col("last_chan").as("channel"))
      .agg(count(lit(1)).as("n_last_touch"))
    firsts.join(lasts, Seq("channel"), "full_outer")
      .join(linear, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_first_touch"), lit(0L)).as("n_first_touch"),
        coalesce(col("n_last_touch"), lit(0L)).as("n_last_touch"),
        round(coalesce(col("lin"), lit(0).cast("decimal(18,8)")).cast("double"), 6)
          .as("linear_credit"))
  }

  /** Geometric adstock (Broadbent 1979) correlation: does the carryover-
    * transformed driver series explain the outcome better than the raw one?
    * Truncated adstock `A_t = Σ_{k=0..maxLag} θ^k · x_{t−k}` — finite-lag, so
    * it's a calendar equi-join over a lag spine (the [[Series.acf]] shape),
    * NOT a recursion; θ^k enters as `exp(k·ln θ)` with ln θ a literal, the
    * q_decayed_popularity exp discipline both engines parse identically.
    * Reports Pearson(outcome, adstock) next to Pearson(outcome, raw) — the
    * lift is the carryover evidence a marketing-mix model builds on.
    *
    * Driver/outcome must be exact integer-valued DECIMAL daily aggregates;
    * adstock terms and all Pearson moments accumulate as DECIMAL(28,12)
    * (order-independent; day count is calendar-bounded). Output: 1 row
    * (n_days, corr_raw, corr_adstock).
    */
  def adstockCorrelation(driver: DataFrame, outcome: DataFrame,
                         dayCol: String, xCol: String, yCol: String,
                         lnTheta: Double, maxLag: Int): DataFrame = {
    val x = driver.select(col(dayCol).as("__day"),
      col(xCol).cast("decimal(19,0)").as("__x"))
    val y = outcome.select(col(dayCol).as("__yday"),
      col(yCol).cast("decimal(19,0)").as("__y"))
    val lagged = x.select(
        explode(sequence(lit(0), lit(maxLag))).as("k"),
        col("__day"), col("__x"))
      .select(date_add(col("__day"), col("k")).as("__tday"),
        (exp(col("k") * lnTheta) * col("__x")).cast("decimal(28,12)")
          .as("__term"))
    val ads = lagged.groupBy(col("__tday")).agg(sum(col("__term")).as("__a"))
    // early days carry their PARTIAL lag window (fewer terms) — standard
    // truncated-adstock behavior; rows need both an adstock and outcome day
    val joined = y.join(ads, col("__yday") === col("__tday"))
      .join(x.select(col("__day").as("__yday"), col("__x")), Seq("__yday"))
    def corrOf(a: Column, b: Column): Column = {
      val n = count(lit(1)).cast("double")
      val sa = sum(a.cast("decimal(28,12)")).cast("double")
      val sb = sum(b.cast("decimal(28,12)")).cast("double")
      val sab = sum((a * b).cast("decimal(38,12)")).cast("double")
      val saa = sum((a * a).cast("decimal(38,12)")).cast("double")
      val sbb = sum((b * b).cast("decimal(38,12)")).cast("double")
      (n * sab - sa * sb) / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    }
    joined.agg(count(lit(1)).as("n_days"),
      round(corrOf(col("__x").cast("double"), col("__y").cast("double")), 6)
        .as("corr_raw"),
      round(corrOf(col("__a").cast("double"), col("__y").cast("double")), 6)
        .as("corr_adstock"))
  }
}
