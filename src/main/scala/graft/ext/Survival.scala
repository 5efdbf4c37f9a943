package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-to-event analysis for product/conversion funnels — the Kaplan-Meier
  * estimator over right-censored durations (Kaplan & Meier '58), the standard
  * answer to "how long until users convert, given most haven't yet". Naive
  * conversion-time averages over ONLY the converted users are survivorship-
  * biased; KM credits the unconverted (censored) users with the time they
  * were observed not converting.
  *
  * Scale shape: subjects collapse to one row per distinct duration in a keyed
  * aggregate (events + censorings per duration), so the survival-curve window
  * runs over a table bounded by the number of distinct durations — a calendar
  * dimension (days/weeks), NOT a function of subject count. The single-
  * partition window over that bounded table is deliberate and safe at any
  * corpus size (the [[graft.metrics.LongTail]] distributed prefix sum exists
  * for the unbounded-domain case).
  */
object Survival {

  /** Kaplan-Meier survival table from per-subject durations.
    *
    * Input: one row per subject — `durationCol` (integer time units observed)
    * and `eventCol` (1 = the event happened at that duration, 0 = censored:
    * observation ended without the event). Output: one row per distinct
    * duration t with (t, n_at_risk, n_events, n_censored, survival), where
    * `survival` = Π over event times t' ≤ t of (1 − d_{t'} / r_{t'}).
    *
    * Cross-engine determinism: each factor's log is computed from exact
    * integer ratios, truncated to DECIMAL(18,8), and cumulatively summed
    * (addition-order-independent — the unigramNll pattern), then exponentiated
    * and rounded once at the end. When a risk set is fully consumed
    * (d = r, survival hits exactly 0) the log factor is −∞; both engines
    * state it as the finite sentinel −50 (exp ≈ 2e−22, rounds to 0 at 6
    * decimals) so the arithmetic stays finite and identical.
    */
  def kaplanMeier(durations: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byT = durations
      .groupBy(col(durationCol).as("t"))
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("n_events"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("n_censored"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val leaving = col("n_events") + col("n_censored")
    // at_risk(t) = total subjects − everyone who left strictly before t
    val atRisk = sum(leaving).over(wAll) - (sum(leaving).over(w) - leaving)
    val logTerm = when(col("n_events") === 0, lit(0.0))
      .when(col("n_events") < col("n_at_risk"),
        log(lit(1.0) - col("n_events").cast("double") / col("n_at_risk")))
      .otherwise(lit(-50.0))
    byT
      .withColumn("n_at_risk", atRisk)
      .withColumn("log_term", logTerm.cast("decimal(18,8)"))
      .withColumn("survival",
        round(exp(sum(col("log_term")).over(w).cast("double")), 6))
      .select(col("t"), col("n_at_risk"), col("n_events"), col("n_censored"),
        col("survival"))
  }
}
