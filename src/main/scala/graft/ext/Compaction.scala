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
}
