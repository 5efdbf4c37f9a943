package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog compaction — the lakehouse MERGE/upsert primitive as a batch
  * operator: collapse a CDC-style stream of keyed versions to the CURRENT
  * state table (one row per live key), honoring delete markers.
  *
  * Latest-wins: per key, the row with the maximal version tuple survives; if
  * that surviving row matches the `tombstone` predicate the key is deleted
  * from the output (a tombstone only counts when it is the LATEST version —
  * an old delete overwritten by a later upsert resurrects the key, the
  * standard log-compaction contract).
  *
  * Scale shape: one key-partitioned shuffle, one sort — both windows (the
  * latest-rank and the version count) share the partitioning and the sort, so
  * each task buffers one key group at a time, bounded by versions-per-key
  * (the natural CDC bound; a key hot enough to overflow a task needs
  * upstream log truncation, not a wider window). Version columns must
  * totally order rows within a key (pass a unique id as the last tiebreaker)
  * or the surviving row is nondeterministic.
  */
object Compaction {

  /** Compact `changelog` to current state. Output: every changelog column
    * plus `n_versions` (rows folded into the key, tombstoned keys excluded
    * from output but their versions counted like any other).
    */
  def compactLatest(changelog: DataFrame, keyCols: Seq[String],
                    versionCols: Seq[String], tombstone: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "keyCols and versionCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc): _*)
    changelog
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(
        Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("rn") === 1 && !tombstone)
      .drop("rn")
  }

  /** Incremental materialized-rollup maintenance — the warehouse pattern that
    * keeps a (keys → count, sum) rollup current as new fact rows land,
    * WITHOUT rescanning history: aggregate only the delta to the rollup
    * grain, then full-outer-merge it into the base with coalesced additive
    * metrics. Correctness contract: the merged result is row-identical to
    * recomputing the rollup over (history ∪ delta) from scratch — which is
    * exactly what the oracle checks, making the merge algebra itself the
    * thing under test.
    *
    * `base` carries (keyCols..., n, s); `delta` carries raw rows with
    * `valueCol` (already quantized exact — DECIMAL/long — so addition is
    * associative). Count and sum are the additive pair from which avg
    * derives; min/max merge the same way, quantiles do not (that's what
    * sketches are for).
    *
    * Scale shape: the delta aggregate is delta-sized and map-side combined;
    * the merge join shuffles on the rollup keys — with the base stored
    * bucketed by those keys ([[graft.sources.Bucketed]]) the base side is
    * co-located and only the tiny delta aggregate moves. Nothing rescans
    * fact history.
    */
  def incrementalRollup(base: DataFrame, delta: DataFrame,
                        keyCols: Seq[String], valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val deltaAgg = delta.groupBy(keys: _*)
      .agg(count(lit(1)).as("__dn"), sum(col(valueCol)).as("__ds"))
    base.join(deltaAgg, keyCols, "full_outer")
      .select(keys ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L).cast("decimal(38,0)")) +
          coalesce(col("__ds"), lit(0L).cast("decimal(38,0)"))).as("s")): _*)
  }
}
