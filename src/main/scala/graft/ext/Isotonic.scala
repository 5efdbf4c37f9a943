package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Isotonic (monotone non-decreasing) calibration via pool-adjacent-violators
  * (PAVA; Robertson, Wright & Dykstra 1988) — the standard nonparametric
  * score-calibration fit: given per-bucket success counts over an ordered
  * score axis, find the monotone rate curve minimizing squared error. The
  * q_score_calibration reliability diagram SHOWS miscalibration; this
  * produces the corrected curve a serving layer applies.
  *
  * The violator test is EXACT: blocks merge while
  * `pos_prev · n_new ≥ pos_new · n_prev` (cross-multiplied integers — no
  * float rate ever decides a pool), so block boundaries are bit-identical
  * across engines; the only floats are the final block-rate divisions. The
  * DuckDB oracle states the same fit through the minimax characterization
  * `iso(i) = max_{k≤i} min_{j≥i} avg(k..j)` over the same exact prefix
  * sums — two independent formulations, one answer.
  *
  * Scale shape: the fold runs per group over the PRE-AGGREGATED score
  * buckets (a calibration axis is 10-1000 buckets, not the corpus) after a
  * group repartition + sort — the [[ChangeDetect.cusum]] discipline. The
  * corpus-sized work is only the upstream bucket aggregate the caller
  * provides.
  */
object Isotonic {

  /** PAVA fit per group. `df` must be one row per (group, x) with exact
    * integer `posCol` (successes) and `nCol` (trials > 0). Output per input
    * row: (group, x, pos, n, raw_rate, iso_rate), rates rounded half-up to
    * 6 decimals, iso_rate non-decreasing in x within each group.
    */
  def isotonicFit(df: DataFrame, groupCol: String, xCol: String,
                  posCol: String, nCol: String): DataFrame = {
    val z = df.select(col(groupCol).as("g"), col(xCol).cast("long").as("x"),
      col(posCol).cast("long").as("pos"), col(nCol).cast("long").as("n"))

    val schema = StructType(Seq(
      StructField("g", z.schema("g").dataType),
      StructField("x", LongType, nullable = false),
      StructField("pos", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("raw_rate", DoubleType, nullable = false),
      StructField("iso_rate", DoubleType, nullable = false)))
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)

    z.repartition(col("g"))
      .sortWithinPartitions(col("g"), col("x"))
      .mapPartitions { it =>
        // block stack: (sumPos, sumN, members as (x, pos, n))
        final case class Block(sp: Long, sn: Long,
                               rows: List[(Long, Long, Long)])
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var g: Any = null
        var started = false
        var stack = List.empty[Block]
        def flush(): Unit = if (started) {
          stack.reverse.foreach { blk =>
            val iso = blk.sp.toDouble / blk.sn
            blk.rows.reverse.foreach { case (x, p, n) =>
              out += Row(g, x, p, n,
                BigDecimal(p.toDouble / n)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
                BigDecimal(iso)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          }
        }
        it.foreach { r =>
          val rg = r.get(0)
          if (!started || rg != g) {
            flush(); g = rg; started = true; stack = Nil
          }
          var blk = Block(r.getLong(2), r.getLong(3),
            List((r.getLong(1), r.getLong(2), r.getLong(3))))
          // pool while the previous block's rate ≥ the new block's — exact
          // integer cross-multiplication (BigInt: pooled counts at corpus
          // scale can push sp·sn past Long), never a float comparison
          while (stack.nonEmpty &&
            BigInt(stack.head.sp) * blk.sn >= BigInt(blk.sp) * stack.head.sn) {
            val prev = stack.head
            stack = stack.tail
            blk = Block(prev.sp + blk.sp, prev.sn + blk.sn,
              blk.rows ::: prev.rows)
          }
          stack = blk :: stack
        }
        flush()
        out.iterator
      }(enc)
      .toDF(groupCol, xCol, "pos", "n", "raw_rate", "iso_rate")
  }
}
