package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min Sketch — the fixed-memory frequency oracle (Cormode &
  * Muthukrishnan, J. Algorithms 2005): d hash rows × w buckets of counters;
  * an item's estimate is the MIN over its d bucket counters, which can only
  * OVER-estimate (collisions add, never subtract) — `est ≥ true` always,
  * `est ≤ true + εN` with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  * Complements the engine's existing deterministic heavy-hitter surface
  * (`SpaceSavingAggregator`): SpaceSaving tracks the top-k identities; CMS
  * answers point frequency queries for ANY item in O(d) from O(d·w) memory —
  * what a 100 TB pipeline ships to a coordinator instead of a full item
  * histogram.
  *
  * Hashes are md5-prefix derived ([[Dedup]]'s portable-hash idiom) so the
  * DuckDB oracle replays the exact bucket assignment:
  * `bucket_j(x) = conv(substr(md5(j||':'||x),1,8),16,10) % w`.
  *
  * Scale shape: counts are reduced per item FIRST (map-side combined
  * groupBy), so the d-way explode runs over the item table, not the raw
  * scan; the sketch itself is d·w rows regardless of scale; probes join the
  * broadcast sketch.
  */
object Sketches {

  private def bucket(j: org.apache.spark.sql.Column,
                     item: org.apache.spark.sql.Column, width: Int) =
    conv(substring(md5(concat(j.cast("string"), lit(":"),
      item.cast("string"))), 1, 8), 16, 10).cast("long") % width

  /** Build the d×w sketch from an item column: one row per (hash row j,
    * bucket) with the summed count. */
  def countMinSketch(df: DataFrame, itemCol: String,
                     depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape d=$depth w=$width")
    val counts = df.groupBy(col(itemCol).as("item")).agg(count(lit(1)).as("cnt"))
    counts
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("item"), col("cnt"))
      .groupBy(col("j"), bucket(col("j"), col("item"), width).as("bucket"))
      .agg(sum(col("cnt")).as("bucket_cnt"))
  }

  /** Point-query the sketch for the true top-k items and report the
    * overestimate — the accuracy audit a pipeline runs before trusting the
    * sketch at full scale. Output per item (true-count desc, item asc):
    * (item, true_cnt, cms_estimate, overestimate ≥ 0).
    */
  def countMinTopKAudit(df: DataFrame, itemCol: String, k: Int = 10,
                        depth: Int = 4, width: Int = 256): DataFrame = {
    val counts = df.groupBy(col(itemCol).as("item")).agg(count(lit(1)).as("true_cnt"))
    val sketch = countMinSketch(df, itemCol, depth, width)
    val top = counts.orderBy(col("true_cnt").desc, col("item")).limit(k)
    val probes = top
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("item"), col("true_cnt"))
      .withColumn("bucket", bucket(col("j"), col("item"), width))
    probes.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("item"), col("true_cnt"))
      .agg(min(col("bucket_cnt")).as("cms_estimate"))
      .select(col("item"), col("true_cnt"), col("cms_estimate"),
        (col("cms_estimate") - col("true_cnt")).as("overestimate"))
      .orderBy(col("true_cnt").desc, col("item"))
  }
}
