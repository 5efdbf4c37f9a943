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
    val iv = explodeBuckets(intervals, startCol, endCol, bucketWidth,
      maxBucketsPerInterval, "rangeJoinPairs")
    p.join(iv,
        col(pointKey) === col(intervalKey) &&
          p("__bk") === iv("__bk") &&
          col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bk")
  }

  /** Explode interval rows to one row per covered bucket (`__bk`), with the
    * fail-fast guard on runaway intervals and empty-interval drop shared by
    * [[rangeJoinPairs]] and [[intervalOverlapPairs]].
    */
  private def explodeBuckets(df: DataFrame, startCol: String, endCol: String,
                             bucketWidth: Long, maxBucketsPerInterval: Long,
                             opName: String): DataFrame = {
    val w = lit(bucketWidth)
    val firstBk = floor(col(startCol) / w)
    val lastBk = floor((col(endCol) - 1) / w)
    val nBuckets = lastBk - firstBk + 1
    df.filter(col(endCol) > col(startCol))
      .withColumn("__bk", explode(
        when(nBuckets <= lit(maxBucketsPerInterval), sequence(firstBk, lastBk))
          .otherwise(raise_error(concat(
            lit(s"$opName: interval [${startCol}, ${endCol}) spans "),
            nBuckets.cast("string"),
            lit(s" buckets (> max $maxBucketsPerInterval at bucketWidth " +
              s"$bucketWidth); raise bucketWidth or cap sentinel ends"))))))
  }

  /** Interval×interval OVERLAP join: pair every `a` row with every same-key `b`
    * row whose half-open interval intersects it (`aStart < bEnd ∧ bStart <
    * aEnd`). Like [[rangeJoinPairs]], the naive key+inequality formulation
    * materializes every same-key pair; here both sides explode to covered
    * time buckets and the join is an EQUI-join on (key, bucket) with the
    * overlap predicate residual.
    *
    * An overlapping pair shares EVERY bucket the intersection spans — the join
    * additionally requires the bucket to be the one containing the
    * intersection's start (`floor(greatest(aStart, bStart)/width)`, covered by
    * both sides' explodes by construction), so each pair emerges EXACTLY once
    * with no distinct pass. Column sets must be disjoint; for a self-join,
    * pre-rename one side and filter to an id order (a < b) on the result.
    */
  def intervalOverlapPairs(a: DataFrame, b: DataFrame,
                           aKey: String, bKey: String,
                           aStart: String, aEnd: String,
                           bStart: String, bEnd: String,
                           bucketWidth: Long,
                           maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val common = a.columns.toSet.intersect(b.columns.toSet)
    require(common.isEmpty, s"overlap join column names collide: $common")
    val av = explodeBuckets(a, aStart, aEnd, bucketWidth,
      maxBucketsPerInterval, "intervalOverlapPairs")
    val bv = explodeBuckets(b, bStart, bEnd, bucketWidth,
      maxBucketsPerInterval, "intervalOverlapPairs")
    av.join(bv,
        col(aKey) === col(bKey) &&
          av("__bk") === bv("__bk") &&
          col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
          av("__bk") ===
            floor(greatest(col(aStart), col(bStart)) / lit(bucketWidth)))
      .drop("__bk")
  }
}
