package graft.metrics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StructField, StructType}

/** Long-tail interaction-volume distribution.
  *
  * Semantics of the reference's `long_tail_plot`
  * (/root/reference/recmetrics_pyspark/recmetrics_pyspark.py:27-103): per-item
  * interaction volume descending, cumulative volume, percent of total volume, and a
  * head/tail split at `headPct`. The reference renders a matplotlib figure; we return
  * the underlying data as a DataFrame (SURVEY.md §7.5.1). Ties are broken by item id so
  * the output is deterministic (§2.4.7 — the reference's plain `orderBy(desc("volume"))`
  * is not).
  *
  * Output schema: (item, volume, rank, cum_volume, pct_of_total, is_head).
  */
object LongTail {

  /** Scale-friendly implementation: the running total is computed with a two-phase
    * distributed prefix sum (range-repartition on the sort key, per-partition totals
    * collected once — one Long per partition — then per-partition running sums offset
    * by the broadcast prefix). No single-partition global window, so the cumsum holds
    * at catalog sizes where `Window.orderBy(...)` (one task) would not.
    */
  def longTailDF(df: DataFrame, itemCol: String, headPct: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    val counts = df.groupBy(col(itemCol)).agg(count(lit(1)).as("volume"))

    val sorted = counts
      .repartitionByRange(col("volume").desc, col(itemCol))
      .sortWithinPartitions(col("volume").desc, col(itemCol))
      .select(col(itemCol), col("volume").cast(LongType))

    // One tiny job: (rows, volumeSum) per partition → prefix offsets on the driver.
    val partStats = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var rows = 0L; var vol = 0L
        it.foreach { r => rows += 1; vol += r.getLong(1) }
        Iterator((pid, rows, vol))
      }
      .collect()
      .sortBy(_._1)
    val rowOffsets = partStats.map(_._2).scanLeft(0L)(_ + _)
    val volOffsets = partStats.map(_._3).scanLeft(0L)(_ + _)
    val total = volOffsets.last.toDouble
    val bcRow = spark.sparkContext.broadcast(rowOffsets)
    val bcVol = spark.sparkContext.broadcast(volOffsets)

    val outRows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rank = bcRow.value(pid)
      var cum = bcVol.value(pid)
      it.map { r =>
        rank += 1
        val vol = r.getLong(1)
        cum += vol
        val pct = cum / total
        Row(r.get(0), vol, rank, cum, pct, pct <= headPct)
      }
    }
    val itemField = df.schema(itemCol)
    val schema = StructType(Seq(
      StructField(itemCol, itemField.dataType, itemField.nullable),
      StructField("volume", LongType, nullable = false),
      StructField("rank", LongType, nullable = false),
      StructField("cum_volume", LongType, nullable = false),
      StructField("pct_of_total", DoubleType, nullable = false),
      StructField("is_head", BooleanType, nullable = false)
    ))
    spark.createDataFrame(outRows, schema)
  }

  /** Single-window formulation — same result as [[longTailDF]]; used as the
    * differential-test partner (SURVEY.md §5). Fine at item-table sizes that fit one
    * task; not the 100 TB path.
    */
  def longTailWindowDF(df: DataFrame, itemCol: String, headPct: Double = 0.5): DataFrame = {
    val w = Window.orderBy(col("volume").desc, col(itemCol))
    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.groupBy(col(itemCol)).agg(count(lit(1)).as("volume"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .withColumn("cum_volume", sum("volume").over(cumW))
      .withColumn("pct_of_total", col("cum_volume") / sum("volume").over(Window.partitionBy()))
      .withColumn("is_head", col("pct_of_total") <= lit(headPct))
  }

  /** Hill estimator of the tail index of the item-popularity distribution —
    * the quantitative companion of the long-tail curve: a power-law tail
    * `P(V > v) ~ v^(-α)` has `α̂ = k / Σ_{i=1..k} ln(x_(i) / x_(k+1))` over
    * the k largest per-item volumes x_(1) ≥ … ≥ x_(k) (Hill, Ann. Stat.
    * 1975). Small α̂ (≈1) = blockbuster-dominated catalog; large α̂ = thin
    * tail. Ties are broken by item id so the order statistics are
    * deterministic (§2.4.7 discipline).
    *
    * Scale shape: the only full-data pass is the groupBy count; the top-(k+1)
    * order statistics come from `orderBy().limit(k+1)` — planned as
    * TakeOrderedAndProject (bounded per-partition heaps, k+1 rows cross the
    * wire), never a global sort. The window below runs on ≤ k+1 rows
    * post-limit, so its single task is bounded by construction. Each ln term
    * is cast to DECIMAL(18,8) before the sum (addition-order-independent).
    * Output: 1 row (k, x_kplus1, sum_log, hill_alpha), doubles rounded
    * half-up to 6 decimals.
    */
  def hillTailIndex(df: DataFrame, itemCol: String, k: Int = 100): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val top = df.groupBy(col(itemCol)).agg(count(lit(1)).as("volume"))
      .orderBy(col("volume").desc, col(itemCol))
      .limit(k + 1)
    // ≤ k+1 rows here — the unpartitioned window is bounded, not a scale path
    val ranked = top.withColumn("rnk",
      row_number().over(Window.orderBy(col("volume").desc, col(itemCol))))
    val tail = ranked.filter(col("rnk") === k + 1)
      .select(col("volume").as("x_kplus1"))
    ranked.filter(col("rnk") <= k)
      .crossJoin(broadcast(tail))
      .select(col("volume"), col("x_kplus1"),
        log(col("volume").cast("double") / col("x_kplus1"))
          .cast("decimal(18,8)").as("term"))
      .groupBy(col("x_kplus1"))
      .agg(sum(col("term")).as("s"))
      .select(lit(k).as("k"), col("x_kplus1"),
        round(col("s").cast("double"), 6).as("sum_log"),
        round(lit(k.toDouble) / col("s").cast("double"), 6).as("hill_alpha"))
  }
}
