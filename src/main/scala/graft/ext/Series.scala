package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series diagnostics over aggregated day-grain series.
  *
  * The input series is the OUTPUT of a distributed aggregation (e.g. daily
  * revenue): even at 100 TB of raw events the day grain is a few thousand
  * rows, so the lag joins here are deliberately small — the scale-bearing
  * work happened in the upstream groupBy, which map-side combines.
  */
object Series {

  /** Sample autocorrelation of a (day, x) series at lags 1..maxLag, Pearson
    * over the aligned pairs (x_t, x_{t−lag}) — the seasonality probe run
    * before picking a forecasting baseline (a weekly cycle shows as a peak
    * at lag 7).
    *
    * The lag alignment is an EQUI-join: the lagged side explodes each row
    * into (lag, day+lag) keys, so Catalyst plans a hash join rather than the
    * O(n²) nested-loop a `datediff BETWEEN 1 AND maxLag` theta-join would
    * give. Per-lag moment sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in
    * DECIMAL — exact under any partition order — and the correlation is one
    * double formula over the exact aggregates:
    * r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²)),
    * evaluated in the same operation order as the DuckDB oracle so results
    * hash-match bit-for-bit.
    *
    * `x` must already be DECIMAL(18,2) (caller casts) so products stay
    * exactly representable: (18,2)×(18,2) → (37,4), summed at (38,4).
    */
  def acf(series: DataFrame, dayCol: String, xCol: String,
          maxLag: Int): DataFrame = {
    // integer cents: Pearson is scale-invariant, and integer moments keep
    // every product/sum exact on BOTH engines at any data scale — the
    // DECIMAL(18,2) form overflowed DuckDB's int64 decimal path on sf0.1's
    // ~1.6e7 daily revenues (x·x products ~2.5e18, sums beyond int64)
    val d = series.select(col(dayCol).as("__day"),
      (col(xCol).cast("decimal(18,2)") * 100).cast("decimal(19,0)").as("__x"))
    val lagged = d.select(
        explode(sequence(lit(1), lit(maxLag))).as("lag"),
        col("__day"), col("__x"))
      .select(col("lag"), date_add(col("__day"), col("lag")).as("__tday"),
        col("__x").as("__xs"))
    val pairs = d.join(lagged, col("__day") === col("__tday"))
      .select(col("lag"), col("__x").as("y"), col("__xs").as("x"))
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    def dbl(c: Column): Column = c.cast("double")
    val n = dbl(col("n_pairs"))
    val num = n * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))
    val den = sqrt((n * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) *
      (n * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy"))))
    // lag as BIGINT: the oracle's generate_series unnests to int64, and the
    // driver's hash compare is typed
    // degenerate lags (zero variance on either side) yield null, not a
    // divide-by-zero (ANSI mode throws on a plain x/0)
    m.select(col("lag").cast("long").as("lag"), col("n_pairs"),
        round(num / when(den === 0.0, lit(null)).otherwise(den), 6).as("acf"))
      .orderBy(col("lag"))
  }

  /** χ²(0.95) critical values for df = 1..15 — literals so both engines see
    * identical doubles (neither has an inverse-χ² builtin).
    */
  private val Chi2Crit95: Array[Double] = Array(
    3.841458820694124, 5.991464547107979, 7.814727903251179,
    9.487729036781154, 11.070497693516351, 12.591587243743977,
    14.067140449340169, 15.50731305586545, 16.918977604620448,
    18.307038053275146, 19.67513757268249, 21.02606981748307,
    22.362032494826934, 23.684791304840576, 24.99579013972863)

  /** Local-maximum (peak) detection over a (group, day, value) daily
    * aggregate: a day is a peak iff its value STRICTLY exceeds both calendar
    * neighbors' (missing neighbor = series edge → not a peak, the
    * conservative convention), with prominence = v − max(neighbors). The
    * monitoring primitive between q_anomaly_daily's global z-flags and
    * q_cusum's level-shift alarm: "which days spiked relative to their
    * immediate context?".
    *
    * `valueCol` must be exact DECIMAL so the strict comparisons can't sit on
    * a float knife-edge. One group-partitioned lag/lead window pass; output
    * only the peak rows: (group, day, value, prominence), prominence in
    * `unitScale`-divided units rounded to 6 decimals.
    */
  def peaks(df: DataFrame, groupCol: String, dayCol: String,
            valueCol: String, unitScale: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__g")).orderBy(col("__d"))
    df.select(col(groupCol).as("__g"), col(dayCol).as("__d"),
        col(valueCol).as("__v"))
      .withColumn("__prev", lag(col("__v"), 1).over(w))
      .withColumn("__next", lead(col("__v"), 1).over(w))
      .filter(col("__prev").isNotNull && col("__next").isNotNull &&
        col("__v") > col("__prev") && col("__v") > col("__next"))
      .select(col("__g").as(groupCol), col("__d").as(dayCol),
        round(col("__v").cast("double") / unitScale, 6).as("value"),
        round((col("__v") - greatest(col("__prev"), col("__next")))
          .cast("double") / unitScale, 6).as("prominence"))
  }

  /** Lead–lag cross-correlation between two daily series: Pearson of
    * (x_t, y_{t+lag}) for lag ∈ [−maxLag, maxLag] — "does series x LEAD
    * series y?" (positive-lag peak) or lag it. The two-series generalization
    * of [[acf]], same machinery: the lag alignment is an equi-join on
    * day+lag keys (the lagged side explodes over the lag spine, so Catalyst
    * plans a hash join), per-lag moments accumulate in exact DECIMAL, and
    * the correlation is one double formula over the exact aggregates in the
    * same operation order as the oracle.
    *
    * `x`/`y` must already be exact integer-valued DECIMAL daily aggregates
    * (the [[acf]] micro-unit convention). Output per lag:
    * (lag, n_pairs, xcorr), null on degenerate variance.
    */
  def crossCorrelation(xs: DataFrame, ys: DataFrame, dayCol: String,
                       xCol: String, yCol: String, maxLag: Int): DataFrame = {
    val a = xs.select(col(dayCol).as("__day"),
      col(xCol).cast("decimal(19,0)").as("__x"))
    val b = ys.select(col(dayCol).as("__bday"),
      col(yCol).cast("decimal(19,0)").as("__y"))
    val lagged = a.select(
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"),
        col("__day"), col("__x"))
      .select(col("lag"), date_add(col("__day"), col("lag")).as("__tday"),
        col("__x"))
    val pairs = lagged.join(b, col("__tday") === col("__bday"))
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__y") * col("__y")).as("syy"))
    def dbl(c: Column): Column = c.cast("double")
    val n = dbl(col("n_pairs"))
    val num = n * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))
    val den = sqrt((n * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) *
      (n * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy"))))
    m.select(col("lag").cast("long").as("lag"), col("n_pairs"),
        round(num / when(den === 0.0, lit(null)).otherwise(den), 6)
          .as("xcorr"))
      .orderBy(col("lag"))
  }

  /** Ljung–Box portmanteau whiteness test over the [[acf]] lag correlations:
    * Q = n(n+2)·Σ_{k=1..m} ρ_k²/(n−k) — "is there ANY autocorrelation left
    * in the first m lags?", the standard residual-whiteness gate after a
    * seasonal/trend model (vs q_acf which reports each lag separately).
    * Compared against the χ²(0.95, df=m) critical value (literal constant —
    * no inverse-CDF builtin in either engine).
    *
    * The ρ_k are [[acf]]'s lag-k Pearson correlations ROUNDED to 6 decimals
    * first (the cross-engine quantization point — libm ulp skew in the ρ's
    * cannot flip Q); each Q term is cast to DECIMAL(18,8) before the sum.
    * Scale shape: [[acf]]'s equi-join plus one m-row aggregate. Output:
    * 1 row (n_obs, max_lag, q_stat, chi2_crit_95, reject_white).
    */
  def ljungBox(series: DataFrame, dayCol: String, xCol: String,
               maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= Chi2Crit95.length,
      s"maxLag ($maxLag) must be in 1..${Chi2Crit95.length}")
    val crit = Chi2Crit95(maxLag - 1)
    val rho = acf(series, dayCol, xCol, maxLag)
    val n = series.agg(count(lit(1)).as("n_obs"))
    rho.crossJoin(broadcast(n))
      .select(col("n_obs"),
        ((col("acf") * col("acf")) / (col("n_obs") - col("lag")))
          .cast("decimal(18,8)").as("__term"))
      .groupBy(col("n_obs"))
      .agg(sum(col("__term")).as("__s"))
      .select(col("n_obs"), lit(maxLag).cast("long").as("max_lag"),
        round((col("n_obs") * (col("n_obs") + 2)).cast("double") *
          col("__s").cast("double"), 6).as("q_stat"),
        lit(crit).as("chi2_crit_95"),
        ((col("n_obs") * (col("n_obs") + 2)).cast("double") *
          col("__s").cast("double") > crit).as("reject_white"))
  }

  /** Gumbel block-maxima return levels — classical extreme-value analysis
    * for capacity planning: fit a Gumbel(μ, β) to per-block (per-day) maxima
    * by the method of moments (β̂ = s·√6/π, μ̂ = x̄ − γβ̂ with Euler's
    * γ ≈ 0.5772), then invert the CDF for the T-block return level
    *
    *   x_T = μ − β·ln(−ln(1 − 1/T))
    *
    * — "the daily peak exceeded once every T days". The Gumbel is the
    * correct max-domain for light-tailed daily aggregates; for heavy tails
    * the Hill estimator (`q_hill_tail`) is the companion diagnostic.
    *
    * `xExactCol` must be exact integer-valued DECIMAL block maxima (maxima
    * are order-exact by construction; only the moment sums need DECIMAL).
    * The moment→parameter→level math is one fixed-order double formula with
    * explicit constants (√6/π and γ as shared literals, per the
    * two-engines-one-literal discipline). Scale shape: the block-maxima
    * input is the OUTPUT of an upstream day-grain max aggregation; moments
    * are one tiny aggregate; |horizons| output rows.
    *
    * Output per horizon T asc: (t_blocks, n_blocks, mu, beta, return_level)
    * in x's units (caller rescales/rounds).
    */
  def gumbelReturnLevels(series: DataFrame, xExactCol: String,
                         horizons: Seq[Int]): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ >= 2),
      s"horizons must all be >= 2, got $horizons")
    val m = series
      .select(col(xExactCol).cast("decimal(19,0)").as("x"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val nD = col("n").cast("double")
    val xb = col("sx").cast("double") / nD
    val s = sqrt((col("sxx").cast("double") - nD * (xb * xb)) / (nD - 1))
    val beta = s * lit(0.779696801233676) // sqrt(6)/pi
    val mu = xb - lit(0.5772156649015329) * beta // Euler–Mascheroni
    val spark = series.sparkSession
    import spark.implicits._
    val hs = horizons.sorted.toDF("t_blocks")
    m.crossJoin(broadcast(hs)).select(
      col("t_blocks"), col("n").as("n_blocks"), mu.as("mu"), beta.as("beta"),
      (mu - beta * log(-log(lit(1.0) - lit(1.0) / col("t_blocks").cast("double"))))
        .as("return_level"))
      .orderBy(col("t_blocks"))
  }

  /** Offline single change-point by binary segmentation (Scott & Knott
    * 1974): the split index t that minimizes SSE_left(t) + SSE_right(t)
    * over the day-ordered series — the first recursion step of the classic
    * changepoint detector, and the batch partner of the streaming CUSUM
    * ([[graft.streaming.StreamingOps.cusumStream]]): CUSUM flags drift
    * online against a KNOWN reference; this finds the single most likely
    * break offline with no reference at all.
    *
    * Dual of [[ChangeDetect.bestSplit]] (argmax BETWEEN-segment SSE): total
    * SSE is constant over split choices, so minimizing within-SSE and
    * maximizing between-SSE pick THE SAME split — OmegaModulesSpec pins the
    * two operators to each other on a planted shift. This form adds the
    * variance-decomposition readout (sse_full/sse_split/gain_share, segment
    * means) a monitoring dashboard plots; bestSplit reports the per-group
    * z-scored break scan.
    *
    * Exactness: `x` must be exact DECIMAL (caller casts; revenue cents);
    * prefix sums S(t), S2(t) accumulate in DECIMAL via day-ordered windows,
    * each candidate's cost is ONE fixed double formula over those exact
    * prefixes, and the argmin is min-struct (cost, then smaller t). The
    * day-ordered windows ride a DAY-grain aggregate input — thousands of
    * rows regardless of corpus scale, the bounded shape ScaleGuard exempts.
    *
    * Output: 1 row (split_day = first day of the RIGHT segment, n_left,
    * n_right, mean_left, mean_right, sse_full, sse_split, gain_share =
    * 1 − sse_split/sse_full — how much of the series' variance one break
    * explains).
    */
  def binarySegmentSplit(series: DataFrame, dayCol: String,
                         xCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pref = series
      .select(col(dayCol).as("__day"), col(xCol).cast("decimal(18,2)").as("__x"))
      .withColumn("__t", row_number().over(Window.orderBy(col("__day"))))
      .withColumn("__s", sum(col("__x")).over(w))
      .withColumn("__s2", sum(col("__x") * col("__x")).over(w))
      .withColumn("__next_day", lead(col("__day"), 1).over(
        Window.orderBy(col("__day"))))
    val tot = pref.agg(max(col("__t")).as("__n"),
      max(col("__s")).as("__sn"), max(col("__s2")).as("__s2n"))
    def dbl(c: Column): Column = c.cast("double")
    val cand = pref.crossJoin(broadcast(tot)).filter(col("__t") < col("__n"))
    val costL = dbl(col("__s2")) -
      dbl(col("__s")) * dbl(col("__s")) / dbl(col("__t"))
    val costR = (dbl(col("__s2n")) - dbl(col("__s2"))) -
      (dbl(col("__sn")) - dbl(col("__s"))) * (dbl(col("__sn")) - dbl(col("__s"))) /
        (dbl(col("__n")) - dbl(col("__t")))
    val best = cand
      .select(col("__n"), col("__sn"), col("__s2n"),
        struct((costL + costR).as("cost"), col("__t").as("t"),
          col("__next_day").as("split_day"), col("__s").as("s"),
          col("__s2").as("s2")).as("__c"))
      .groupBy(col("__n"), col("__sn"), col("__s2n"))
      .agg(min(col("__c")).as("__b"))
    best.select(
      col("__b.split_day").as("split_day"),
      col("__b.t").cast("long").as("n_left"),
      (col("__n") - col("__b.t")).cast("long").as("n_right"),
      (dbl(col("__b.s")) / dbl(col("__b.t"))).as("mean_left"),
      ((dbl(col("__sn")) - dbl(col("__b.s"))) /
        (dbl(col("__n")) - dbl(col("__b.t")))).as("mean_right"),
      (dbl(col("__s2n")) - dbl(col("__sn")) * dbl(col("__sn")) /
        dbl(col("__n"))).as("sse_full"),
      col("__b.cost").as("sse_split"),
      {
        // a perfectly flat series has sse_full = 0: no variance for a break
        // to explain — gain is undefined, emitted as null (ANSI double
        // division would otherwise throw)
        val sseFull = dbl(col("__s2n")) - dbl(col("__sn")) * dbl(col("__sn")) /
          dbl(col("__n"))
        when(sseFull === 0.0, lit(null).cast("double"))
          .otherwise(lit(1.0) - col("__b.cost") / sseFull).as("gain_share")
      })
  }

  /** SAX symbolization + motif counts (Lin, Keogh, Lonardi & Chiu, DMKD
    * 2007): z-normalize the day series against its own global moments,
    * average into `paaWidth`-day PAA frames, map each frame to one of four
    * symbols at the Gaussian quartile breakpoints (±0.6745, 0), and count
    * every `wordLen`-symbol sliding word — the discretized motif profile
    * that turns "does this revenue series repeat shapes?" into a GROUP BY.
    *
    * Exactness: moments and PAA sums pool in DECIMAL; μ, σ (population) and
    * each z-score are one fixed double formula; breakpoints are shared
    * literals; words assemble with lead() over the bounded PAA frame
    * sequence. Day-grain input → everything downstream is thousands of
    * rows at any corpus scale.
    *
    * Output per word desc by count then word: (word, n_occurrences).
    */
  def saxMotifs(series: DataFrame, dayCol: String, xCol: String,
                paaWidth: Int = 7, wordLen: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(paaWidth >= 1 && wordLen >= 2,
      s"bad paaWidth=$paaWidth wordLen=$wordLen")
    val base = series
      .select(col(dayCol).as("__day"), col(xCol).cast("decimal(18,2)").as("__x"))
      .withColumn("__t", row_number().over(Window.orderBy(col("__day"))))
    val m = base.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
      sum(col("__x") * col("__x")).as("__sxx"))
    def dbl(c: Column): Column = c.cast("double")
    val muE = dbl(col("__sx")) / dbl(col("__n"))
    val sdE = sqrt(dbl(col("__sxx")) / dbl(col("__n")) - muE * muE)
    val paa = base
      .withColumn("__frame", expr(s"(__t - 1) div $paaWidth"))
      .groupBy(col("__frame"))
      .agg(sum(col("__x")).as("__fs"), count(lit(1)).as("__fn"))
      .crossJoin(broadcast(m))
      .select(col("__frame"),
        ((dbl(col("__fs")) / dbl(col("__fn")) - muE) / sdE).as("__z"))
      .select(col("__frame"),
        when(col("__z") < lit(-0.6745), lit("a"))
          .when(col("__z") < lit(0.0), lit("b"))
          .when(col("__z") < lit(0.6745), lit("c"))
          .otherwise(lit("d")).as("__sym"))
    val wo = Window.orderBy(col("__frame"))
    val word = concat((0 until wordLen).map(i =>
      lead(col("__sym"), i).over(wo)): _*)
    paa.select(word.as("word"))
      .filter(length(col("word")) === wordLen) // trailing partial words drop
      .groupBy(col("word")).agg(count(lit(1)).as("n_occurrences"))
  }
}
