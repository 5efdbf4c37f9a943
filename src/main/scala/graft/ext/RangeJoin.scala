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

  def rangeJoinPairs(points: DataFrame, intervals: DataFrame,
                     pointKey: String, intervalKey: String,
                     pointTime: String, startCol: String, endCol: String,
                     bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val common = points.columns.toSet.intersect(intervals.columns.toSet)
    require(common.isEmpty, s"point/interval column names collide: $common")
    val w = lit(bucketWidth)
    val p = points.withColumn("__bk", floor(col(pointTime) / w))
    val iv = intervals.withColumn("__bk",
      explode(sequence(floor(col(startCol) / w), floor((col(endCol) - 1) / w))))
    p.join(iv,
        col(pointKey) === col(intervalKey) &&
          p("__bk") === iv("__bk") &&
          col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bk")
  }
}
