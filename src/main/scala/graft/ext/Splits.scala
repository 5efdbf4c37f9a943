package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment a training-data
  * pipeline needs to be REPRODUCIBLE and JOIN-FREE: the split is a pure function of
  * the row's id (md5-prefix bucket 0-99), so any job on any day assigns the same row
  * to the same split with zero coordination, and adding data never reshuffles
  * existing assignments (unlike `randomSplit`, which depends on partitioning and
  * seed plumbing). Portable to SQL for the oracle:
  * `('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT % 100`.
  */
object Splits {

  /** Bucket 0-99 from the id's md5 prefix — uniform, deterministic, portable. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Split label ("train" / "val" / "test") with the given percentage bounds. */
  def splitLabel(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(id)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Attach a `split` column to a DataFrame (scan-side expression, zero shuffle). */
  def withSplit(df: DataFrame, idCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), trainPct, valPct))

  /** Deterministic domain-mixture resampling: downsample groups so the kept corpus
    * matches target proportions (`weightsPpm`: group → parts-per-million), keeping
    * as much data as the scarcest group allows. The scale factor
    * `m = min_g floor(n_g·10⁶ / w_g)` is the largest total such that every group
    * can supply its share; group g then keeps `floor(w_g·m / 10⁶)` rows, chosen by
    * md5-of-id order — the same reproducible draw as [[balancedSample]] (identical
    * rows every run, stable under repartitioning; new data re-draws, since both
    * the quotas and the md5 rank order shift). Groups absent
    * from `weightsPpm` get weight 0 (dropped); weighted groups absent from the
    * data simply don't constrain `m`.
    *
    * This is the mixture step of a training-data pipeline (e.g. "10% code, 30%
    * web, 60% books"): two aggregates — per-group counts (#groups rows,
    * broadcast back) and the 1-row scale factor — then one per-group rank window,
    * parallel across groups. The division stays on exact integers (< 2⁵³) so
    * floor() is bit-identical across engines and partitionings. For a whale group
    * at extreme scale, swap the exact rank for the hash-threshold approximation
    * (`hashBucket(id) scaled to n_keep/n_g`) — zero sort, ±binomial-noise counts.
    */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    weightsPpm: Seq[(String, Long)]): DataFrame = {
    require(weightsPpm.nonEmpty && weightsPpm.forall(_._2 > 0),
      "weightsPpm must be non-empty with positive weights")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = weightsPpm.toDF(groupCol, "__w_ppm")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n_g"))
      .join(broadcast(w), groupCol)
    val scale = counts
      .agg(min(floor(col("__n_g") * lit(1000000L) / col("__w_ppm"))).as("__m"))
    val kept = counts.crossJoin(broadcast(scale))
      .select(col(groupCol),
        floor(col("__w_ppm") * col("__m") / lit(1000000L)).as("__n_keep"))
    val rk = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(kept), groupCol)
      .withColumn("__rk", row_number().over(rk))
      .filter(col("__rk") <= col("__n_keep"))
      .drop("__rk", "__n_keep")
  }

  /** Hash-threshold variant of [[mixtureSample]] for whale groups: instead of an
    * exact per-group rank (which sorts the group, serializing a single giant
    * group into one partition's window), each row keeps itself iff its md5
    * fine-bucket (0..10⁶) falls under the group's acceptance rate
    * `n_keep·10⁶ / n_g` — a pure scan-side decision after the same two tiny
    * quota aggregates, ZERO sorts. Kept counts land within binomial noise of
    * the exact quotas (σ ≈ √(rate·(1−rate)·n_g)); the draw is reproducible and
    * repartition-stable like every md5-keyed decision here.
    */
  def mixtureSampleApprox(df: DataFrame, idCol: String, groupCol: String,
                          weightsPpm: Seq[(String, Long)]): DataFrame = {
    require(weightsPpm.nonEmpty && weightsPpm.forall(_._2 > 0),
      "weightsPpm must be non-empty with positive weights")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsPpm.toDF(groupCol, "__w_ppm")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n_g"))
      .join(broadcast(w), groupCol)
    val scale = counts
      .agg(min(floor(col("__n_g") * lit(1000000L) / col("__w_ppm"))).as("__m"))
    val kept = counts.crossJoin(broadcast(scale))
      .select(col(groupCol), col("__n_g"),
        floor(col("__w_ppm") * col("__m") / lit(1000000L)).as("__n_keep"))
    val fineBucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000L
    df.join(broadcast(kept), groupCol)
      .filter(fineBucket * col("__n_g") < col("__n_keep") * lit(1000000L))
      .drop("__n_g", "__n_keep")
  }

  /** Deterministic balanced sampling: keep at most `maxPerGroup` rows per group,
    * chosen by md5-of-id order — a reproducible "random" draw (same rows every
    * run, stable under repartitioning) for dataset balancing / per-class caps.
    * The rank-≤-k window compiles to WindowGroupLimit, so each partition forwards
    * at most `maxPerGroup` rows per group before the shuffle.
    */
  def balancedSample(df: DataFrame, idCol: String, groupCol: String,
                     maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerGroup)
      .drop("__rk")
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis-Spirakis
    * A-ES): each row draws a reproducible uniform `u` from its id's md5 prefix
    * and takes priority `u^(1/w)`; the top-n priorities are a weighted sample
    * without replacement. One scan + TakeOrderedAndProject — no global sort, no
    * driver-side draw, identical rows every run (the weighted counterpart of
    * [[balancedSample]]'s md5-rank draw; use it to sample documents ∝ quality
    * score or length). Weights must be positive.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    // u ∈ (0,1]: 32-bit md5 prefix scaled; +1 dodges u=0 (pow(0, x) = 0 would
    // make weight irrelevant)
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    val priority = pow(u, lit(1.0) / col(weightCol).cast("double"))
    df.withColumn("__pri", priority)
      .orderBy(col("__pri").desc, col(idCol))
      .limit(n)
      .drop("__pri")
  }

  /** Temporal leave-one-out holdout — the recsys evaluation split: each key's
    * LAST event (by time, ties on `tieCol`) becomes "test", everything earlier
    * "train". Unlike a global time cutoff, every key contributes exactly one
    * test point and its full history stays in train — and because the split is
    * a per-key rank, it is leakage-free by construction (no train row is later
    * than its key's test row). One per-key rank window; the rank-1 probe
    * compiles to WindowGroupLimit, so partitions forward one candidate per key
    * per partition before the shuffle.
    */
  def leaveOneOutSplit(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("split",
        when(row_number().over(w) === 1, lit("test")).otherwise(lit("train")))
  }
}
