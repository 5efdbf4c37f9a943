package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range join — pair each point row with every interval row of the
  * same key whose half-open interval `[start, end)` contains the point. Spark
  * plans the naive formulation (`key = key AND t >= s AND t < e`) as a sort-merge
  * join on the key alone with the range as a post-filter — every (point ×
  * same-key interval) pair materializes, quadratic per key.
  *
  * Here both sides are bucketed by time: a point belongs to exactly ONE bucket
  * of width `bucketWidth`; an interval explodes to the (few) buckets it covers
  * via `sequence()`. The join is then a pure EQUI-join on (key, bucket) with the
  * exact range predicate as a residual filter, so only pairs whose times land in
  * the same bucket ever meet — work scales with true temporal locality, not
  * per-key row counts. Each matching pair emerges exactly once (the point's one
  * bucket). Pick `bucketWidth` near the typical interval length: an interval
  * spans ≤ ceil(len/width)+1 buckets, so width ≈ len keeps the explode factor
  * ≤ 2 while keeping buckets selective.
  *
  * Point and interval column sets must be disjoint (pre-rename the interval
  * side); times are plain longs (any consistent unit).
  */
object RangeJoin {

  /** `maxBucketsPerInterval` guards the `sequence()` explode: an interval vastly
    * longer than `bucketWidth` (e.g. an open-ended Long.MaxValue sentinel end)
    * would otherwise generate a huge — or over-the-sequence-limit — bucket array
    * at runtime. Such rows now fail fast with a clear message telling the caller
    * to raise `bucketWidth` (or cap sentinel ends). Empty intervals
    * (`end <= start`, which contain no point under half-open semantics) are
    * dropped before the explode instead of producing a spurious descending
    * `sequence`.
    */
  def rangeJoinPairs(points: DataFrame, intervals: DataFrame,
                     pointKey: String, intervalKey: String,
                     pointTime: String, startCol: String, endCol: String,
                     bucketWidth: Long,
                     maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val common = points.columns.toSet.intersect(intervals.columns.toSet)
    require(common.isEmpty, s"point/interval column names collide: $common")
    val w = lit(bucketWidth)
    val p = points.withColumn("__bk", floor(col(pointTime) / w))
    val firstBk = floor(col(startCol) / w)
    val lastBk = floor((col(endCol) - 1) / w)
    val nBuckets = lastBk - firstBk + 1
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bk", explode(
        when(nBuckets <= lit(maxBucketsPerInterval), sequence(firstBk, lastBk))
          .otherwise(raise_error(concat(
            lit(s"rangeJoinPairs: interval [${startCol}, ${endCol}) spans "),
            nBuckets.cast("string"),
            lit(s" buckets (> max $maxBucketsPerInterval at bucketWidth " +
              s"$bucketWidth); raise bucketWidth or cap sentinel ends"))))))
    p.join(iv,
        col(pointKey) === col(intervalKey) &&
          p("__bk") === iv("__bk") &&
          col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bk")
  }
}
