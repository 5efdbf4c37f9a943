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
}
