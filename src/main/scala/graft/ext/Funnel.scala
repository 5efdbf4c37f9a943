package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream — the two
  * standard product-analytics queries a recommendation/event pipeline runs next to
  * the metrics the reference covers.
  *
  * Both are sequences of keyed aggregations on user_id: each stage is a
  * groupBy(user) min-timestamp with map-side partial aggregation, and the
  * stage-to-stage joins are user-keyed equi-joins that AQE plans against the
  * (shrinking) reached-stage side. Nothing is quadratic; no windows over a global
  * ordering.
  */
object Funnel {

  /** Strictly-ordered funnel: a user "reaches" stage i when an event of type
    * `stages(i)` exists at-or-after their stage-(i−1) reach time (first qualifying
    * timestamp wins). Returns one row of per-stage reach counts
    * (`n_stage_1..n_stage_k`) — each count ≤ the previous, the funnel invariant.
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col(userCol), col(tsCol), col(typeCol))
    // per-stage reached table: (user, reach_ts)
    val reached = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val candidates = e.filter(col(typeCol) === stage)
        val qualified = prev match {
          case None => candidates
          case Some(p) =>
            candidates.join(p.select(col(userCol), col("reach_ts").as("__prev")),
                Seq(userCol))
              .filter(col(tsCol) >= col("__prev"))
        }
        Some(qualified.groupBy(col(userCol)).agg(min(col(tsCol)).as("reach_ts")))
    }.flatten
    reached.zipWithIndex
      .map { case (r, i) => r.agg(count(lit(1)).as(s"n_stage_${i + 1}")) }
      .reduce(_ crossJoin _)
  }

  /** [[funnelCounts]] with per-stage CONVERSION WINDOWS — the standard
    * product-analytics refinement: stage i counts only when its event lands
    * within `windowMs` AFTER the stage-(i−1) reach time (inclusive on both
    * ends); first qualifying timestamp wins, as in the unbounded funnel.
    * Same shuffle profile: per-stage user-keyed min-aggs and monotone-shrinking
    * user-keyed joins, with the window condition folded into the join filter.
    */
  def funnelCountsWindowed(events: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, stages: Seq[String],
                           windowMs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val e = events.select(col(userCol), unix_millis(col(tsCol)).as("__ms"),
      col(typeCol))
    val reached = stages.scanLeft(Option.empty[DataFrame]) {
      case (prev, stage) =>
        val candidates = e.filter(col(typeCol) === stage)
        val qualified = prev match {
          case None => candidates
          case Some(p) =>
            candidates.join(p.select(col(userCol), col("reach_ms").as("__prev")),
                Seq(userCol))
              .filter(col("__ms") >= col("__prev") &&
                col("__ms") <= col("__prev") + windowMs)
        }
        Some(qualified.groupBy(col(userCol)).agg(min(col("__ms")).as("reach_ms")))
    }.flatten
    reached.zipWithIndex
      .map { case (r, i) => r.agg(count(lit(1)).as(s"n_stage_${i + 1}")) }
      .reduce(_ crossJoin _)
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-truncated) of the user's
    * first event; for every (cohort_week, week_offset) pair, the number of cohort
    * users active in that week. The (user, week) activity table is distinct-ed
    * first, so per-user weekly event volume never inflates counts.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekly = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .distinct()
    val cohorts = weekly.groupBy(col(userCol)).agg(min(col("wk")).as("cohort_week"))
    weekly.join(cohorts, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
