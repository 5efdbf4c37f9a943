package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the data-regression gate between two versions of a
  * table (yesterday's corpus vs today's drop, pre- vs post-migration): which
  * keys were added, removed, or changed, detected by a row fingerprint so the
  * comparison is one full-outer join on the key, never a column-by-column
  * equality cascade.
  *
  * The fingerprint is md5 over every non-key column cast to string, joined by
  * the ASCII unit separator (chr(31)) with chr(30)-tagged nulls — separators
  * that cannot collide with content, portable to SQL so the oracle replays
  * the identical fingerprint. Scale shape: two scans + one key-keyed
  * full-outer join; the fingerprint is a scan-side codegen'd expression. Keys
  * must be unique per side (enforce upstream or dedup first).
  */
object TableDiff {

  private val Sep = "\u001f"      // ASCII unit separator
  private val NullTag = "\u001enull" // record separator + tag

  /** Row fingerprint over `cols` (order-sensitive, null-tagged). */
  def rowFingerprint(cols: Seq[String]) =
    md5(concat_ws(Sep,
      cols.map(c => coalesce(col(c).cast("string"), lit(NullTag))): _*))

  /** Diff `oldDf` → `newDf` by `keyCol`. Output: (key, status) for every key
    * whose status ≠ unchanged, status ∈ {added, removed, changed}.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String): DataFrame = {
    require(oldDf.columns.sameElements(newDf.columns),
      s"schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val valueCols = oldDf.columns.filterNot(_ == keyCol).toSeq
    val o = oldDf.select(col(keyCol).as("key"),
      rowFingerprint(valueCols).as("old_fp"))
    val n = newDf.select(col(keyCol).as("key"),
      rowFingerprint(valueCols).as("new_fp"))
    o.join(n, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** Roll the diff up to one row of counts: (n_added, n_removed, n_changed,
    * n_unchanged) — the dashboard number a nightly pipeline alerts on.
    */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, keyCol: String): DataFrame = {
    require(oldDf.columns.sameElements(newDf.columns),
      s"schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val valueCols = oldDf.columns.filterNot(_ == keyCol).toSeq
    val o = oldDf.select(col(keyCol).as("key"),
      rowFingerprint(valueCols).as("old_fp"))
    val n = newDf.select(col(keyCol).as("key"),
      rowFingerprint(valueCols).as("new_fp"))
    o.join(n, Seq("key"), "full_outer")
      .agg(
        sum(when(col("old_fp").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("new_fp").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("old_fp").isNotNull && col("new_fp").isNotNull &&
          col("old_fp") =!= col("new_fp"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("old_fp") === col("new_fp"), 1L).otherwise(0L))
          .as("n_unchanged"))
  }
}
