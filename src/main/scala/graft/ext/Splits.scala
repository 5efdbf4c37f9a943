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
}
