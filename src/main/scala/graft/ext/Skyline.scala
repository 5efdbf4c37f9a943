package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — "which parts are not beaten on BOTH price
  * and size by any other part": the classic multi-objective OLAP operator
  * (Börzsönyi et al., "The Skyline Operator", ICDE 2001). A row is on the
  * skyline iff no other row has `minCol` ≤ its value AND `maxCol` ≥ its value
  * with at least one strict; exact duplicates on both axes are mutually
  * non-dominating and all kept.
  *
  * Scale shape (100 TB): the naive formulation is a quadratic NOT EXISTS
  * self-join. Here dominance collapses onto a per-distinct-`minCol` scaffold:
  *
  *  1. a fixed-width bucket histogram over `minCol` (one aggregate) gives a
  *     per-bucket max of `maxCol`; its strict-prefix running max — computed on
  *     the tiny B-row table and broadcast back — prunes every row already
  *     beaten by a strictly-cheaper bucket, so the exact pass sees only
  *     near-frontier survivors;
  *  2. survivors group to one row per distinct `minCol` value (max `maxCol`
  *     per value), and a strict-prefix window over that value-domain-bounded
  *     table yields `best maxCol among strictly smaller minCol`. A survivor is
  *     dominated iff that prefix max ≥ its `maxCol`, or a same-`minCol` row
  *     has a strictly larger `maxCol`.
  *
  * Raw data crosses the shuffle once (bucket aggregate) plus once over the
  * pruned survivors; the only ordered windows run on bucket- and
  * value-domain-bounded aggregates, never on raw rows.
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier minimizing `minCol`, maximizing
    * `maxCol`. `buckets` sizes the pruning histogram only — any value yields
    * the same result.
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
                buckets: Int = 256): DataFrame = {
    val x = col(minCol).cast("double")
    val y = col(maxCol).cast("double")

    val Array(lo, hi) = df.agg(min(x), max(x)).collect()(0) match {
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    val width = math.max((hi - lo) / buckets, java.lang.Double.MIN_NORMAL)
    val bucket = least(floor((x - lit(lo)) / lit(width)), lit(buckets - 1L))
      .cast("long")

    // per-bucket max y, strict-prefix max over the B-row histogram
    val hist = df.groupBy(bucket.as("__b")).agg(max(y).as("__by"))
    val wb = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = hist.select(col("__b"), max(col("__by")).over(wb).as("__pre"))

    val pruned = df.withColumn("__b", bucket)
      .join(broadcast(prefix), Seq("__b"))
      .filter(col("__pre").isNull || col("__pre") < y)
      .drop("__b", "__pre")

    // exact pass on survivors: distinct-minCol scaffold
    val perX = pruned.groupBy(x.as("__x")).agg(max(y).as("__maxy"))
    val wx = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scaffold = perX.select(col("__x"), col("__maxy"),
      max(col("__maxy")).over(wx).as("__strict"))

    pruned.join(broadcast(scaffold), x === col("__x"))
      .filter((col("__strict").isNull || col("__strict") < y) &&
        col("__maxy") <= y)
      .drop("__x", "__maxy", "__strict")
  }
}
