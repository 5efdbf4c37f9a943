package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANOVA (phase-folding) periodogram — "which cycle length explains the
  * series?" without trigonometry: for each candidate period p, fold the day
  * index into phases t mod p and measure the share of total variance captured
  * by the phase means,
  *
  *   R²(p) = SSB(p)/SST,  SSB = Σ_ph S_ph²/n_ph − S²/N,  SST = Σx² − S²/N.
  *
  * This is the phase-dispersion-minimization idea from variable-star
  * astronomy (Stellingwerf, ApJ 1978) re-expressed as a GROUP BY — a weekly
  * cycle shows as an R² peak at p=7 (and its harmonics 14, 21). Versus the
  * classical DFT periodogram it trades sinusoid resolution for EXACT
  * arithmetic: a sin/cos periodogram needs libm calls whose last-ulp behavior
  * differs across engines, while everything here is integer/DECIMAL sums plus
  * deterministic IEEE divisions, so the result hash-matches the oracle.
  * The ACF (`Series.acf`) answers "is there memory at lag k?"; this answers
  * the complementary "how much variance does a p-cycle explain?".
  *
  * Scale shape: the input is an aggregated day-grain series (a few thousand
  * rows even at 100 TB of raw events — the scale-bearing groupBy happened
  * upstream); the fold is one explode(×|periods|) + groupBy(period, phase),
  * map-side combined. Per-(period,phase) terms S_ph²/n_ph are cast to
  * DECIMAL(38,6) before pooling so the per-period sum is order-exact.
  */
object Periodogram {

  /** Input: (dayCol: date/timestamp at day grain, xMicro: exact DECIMAL micro
    * units of the series value). Day index t = datediff(day, min day). Output,
    * one row per period p in [minPeriod, maxPeriod]:
    * (period, n_days, r2) — r2 raw double (caller rounds).
    */
  def anovaPeriodogram(series: DataFrame, dayCol: String, xMicroCol: String,
                       minPeriod: Int = 2, maxPeriod: Int = 14): DataFrame = {
    require(minPeriod >= 2 && maxPeriod >= minPeriod,
      s"need 2 <= minPeriod <= maxPeriod, got [$minPeriod, $maxPeriod]")
    val d0 = series.agg(min(col(dayCol)).as("__d0"))
    val t = series.crossJoin(broadcast(d0))
      .select(datediff(col(dayCol), col("__d0")).as("t"),
        col(xMicroCol).cast("decimal(19,0)").as("x"))
    val tot = t.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("sxx"))
    val folded = t
      .select(explode(sequence(lit(minPeriod), lit(maxPeriod))).as("period"),
        col("t"), col("x"))
      .groupBy(col("period"), (col("t") % col("period")).as("phase"))
      .agg(count(lit(1)).as("n_ph"), sum(col("x")).as("s_ph"))
    // S_ph² is exact DECIMAL; ONE double division by n_ph is deterministic
    // IEEE on both engines; quantize to DECIMAL(28,6) then pool exactly.
    val term = ((col("s_ph") * col("s_ph")).cast("double") /
      col("n_ph").cast("double")).cast("decimal(38,6)")
    val ssb = folded.groupBy(col("period")).agg(sum(term).as("sum_term"))
    ssb.crossJoin(broadcast(tot))
      .select(col("period"), col("n").as("n_days"),
        ((col("sum_term").cast("double") -
          (col("s") * col("s")).cast("double") / col("n").cast("double")) /
          (col("sxx").cast("double") -
            (col("s") * col("s")).cast("double") / col("n").cast("double")))
          .as("r2"))
      .orderBy(col("period"))
  }
}
