package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-grid histogram quantile sketch + accuracy audit — the one-pass,
  * mergeable, O(bins)-memory quantile path for 100 TB scans (the exact
  * [[GlobalRank.exactQuantiles]] needs a global rank; a histogram needs one
  * min/max pre-pass and one binned count, both map-side combinable, and
  * per-partition histograms MERGE by addition — the property t-digest/KLL
  * offer with better error, here in a form the DuckDB oracle can replay
  * bit-for-bit because there is no randomness and no data-dependent
  * compaction).
  *
  * Estimator: equi-width bins over [min, max]; quantile q interpolates
  * linearly inside the bin containing rank ⌈q·N⌉:
  * `est = lo + width·(bin + (target − cum_before)/bin_count)`. The audit
  * joins the exact percentile_disc value and reports the absolute and
  * relative error — the number that tells you whether 128 bins suffice for
  * YOUR distribution before you trust the sketch at scale.
  *
  * Everything is deterministic IEEE double arithmetic off exact integer
  * counts; the cumulative-before-bin is a bounded self-join over the
  * ≤bins-row histogram (not a window — ScaleGuard discipline).
  */
object HistSketch {

  /** Output per prob asc: (p, est, exact_value, abs_err, rel_err). */
  def histQuantilesAudit(df: DataFrame, valueCol: String,
                         tieCols: Seq[String], probs: Seq[Double],
                         bins: Int = 128): DataFrame = {
    require(bins >= 2 && bins <= 65536, s"bins $bins out of range")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0,1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val mm = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      count(lit(1)).as("n"))
    val binned = v.crossJoin(broadcast(mm))
      .select(least(
        floor(((col("v") - col("lo")) / (col("hi") - col("lo"))) * bins)
          .cast("long"),
        lit(bins - 1L)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    // cumulative BEFORE each bin: bounded self-join over <= bins rows
    val cum = binned.as("a")
      .join(binned.as("b"), col("b.bin") < col("a.bin"), "left")
      .groupBy(col("a.bin").as("bin"), col("a.c").as("c"))
      .agg(coalesce(sum(col("b.c")), lit(0L)).as("cum_before"))
    val ps = probs.sorted.toDF("p")
    val targets = ps.crossJoin(broadcast(mm))
      .select(col("p"), col("lo"), col("hi"), col("n"),
        greatest(lit(1L), ceil(col("p") * col("n")).cast("long")).as("target"))
    val est = targets.join(cum,
        col("target") > col("cum_before") &&
          col("target") <= col("cum_before") + col("c"))
      .select(col("p"),
        (col("lo") + ((col("hi") - col("lo")) / bins) *
          (col("bin").cast("double") +
            (col("target") - col("cum_before")).cast("double") /
              col("c").cast("double"))).as("est"))
    val exact = GlobalRank.exactQuantiles(
        df.select((valueCol +: tieCols).map(col): _*), valueCol, tieCols,
        probs)
      .select(col("p"), col("value").cast("double").as("exact_value"))
    est.join(exact, Seq("p"))
      .select(col("p"), col("est"), col("exact_value"),
        abs(col("est") - col("exact_value")).as("abs_err"),
        (abs(col("est") - col("exact_value")) / abs(col("exact_value")))
          .as("rel_err"))
      .orderBy(col("p"))
  }
}
