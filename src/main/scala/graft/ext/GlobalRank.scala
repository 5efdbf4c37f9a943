package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ranking — `ROW_NUMBER() OVER (ORDER BY ...)` without the
  * single-task global window.
  *
  * Spark plans an un-partitioned window as ONE task holding the whole dataset —
  * the canonical 100 TB scale-killer. This operator produces the identical
  * numbering with the two-phase trick [[graft.metrics.LongTail]] uses for its
  * prefix sum: range-repartition on the sort key (Spark samples split points, so
  * partitions are balanced), sort within partitions, collect ONE Long per
  * partition (row counts), and offset each partition's local numbering by the
  * broadcast prefix. Driver traffic is O(#partitions) scalars; no partition ever
  * holds more than its range share.
  */
object GlobalRank {

  /** Append `rnCol` = the 1-based global row number of each row under the total
    * order `order` (pass enough columns to make the order total — ties would
    * otherwise make the numbering nondeterministic).
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
                      rnCol: String = "rn"): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs at least one sort column")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // One tiny job: rows per partition → prefix offsets on the driver.
    val partCounts = rdd
      .mapPartitionsWithIndex { (pid, it) => Iterator((pid, it.size.toLong)) }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = partCounts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rn = bc.value(pid)
      it.map { r => rn += 1; Row.fromSeq(r.toSeq :+ rn) }
    }
    spark.createDataFrame(out, sorted.schema.add(rnCol, LongType, nullable = false))
  }

  /** Equi-depth (equal-count) histogram of a numeric column: global rank rows by
    * `(valueCol, tieCols...)`, cut into `buckets` equal-count ranges
    * (`bucket = (rn-1)·B / N`, integer division — the same closed form the SQL
    * oracle uses over `ROW_NUMBER()`), then one aggregate per bucket. Output:
    * (bucket, n_rows, min_value, max_value).
    *
    * Unlike equi-WIDTH histograms this adapts bin edges to the data (each bucket
    * holds N/B rows), which is what a profiler wants for skewed columns. The
    * exact form is oracle-checked; at extreme scale the approximate partner is
    * `approx_percentile` bucket edges + a scan-side `CASE` assignment — no
    * global sort at all.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String, tieCols: Seq[String],
                         buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val proj = df.select(valueCol, tieCols: _*)
    val total = proj.count()
    val ranked = globalRowNumber(proj, (valueCol +: tieCols).map(col))
    ranked
      .withColumn("bucket", expr(s"((rn - 1) * $buckets) div $total"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
  }

  /** EXACT quantiles of a column without a single-task sort: the value at
    * global rank `max(1, ceil(p·N))` under the total order
    * `(valueCol, tieCols...)` — percentile_disc semantics, computed on the
    * distributed row number and a broadcast (p, target-rank) join, so only
    * |probs| rows leave the ranked table. The exact partner of
    * [[TextStats.groupQuantilesApprox]]: run THIS when the answer must be a
    * real data value with zero sketch error, the approx form when a rank
    * tolerance is fine and one pass matters. The rank arithmetic
    * (`ceil(p·N)` in IEEE double) is stated identically in the SQL oracle, so
    * the picked element matches bit-for-bit across engines.
    * Output: (p, value), one row per prob.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, tieCols: Seq[String],
                     probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df.select(valueCol, tieCols: _*)
    val total = proj.count()
    val ranked = globalRowNumber(proj, (valueCol +: tieCols).map(col))
    val targets = probs
      .map(p => (p, math.max(1L, math.ceil(p * total).toLong)))
      .toDF("p", "__target")
    ranked.join(broadcast(targets), col("rn") === col("__target"))
      .select(col("p"), col(valueCol).as("value"))
  }

  /** Per-GROUP exact quantiles without per-group single-task sorts: ONE
    * global ranking under `(group, value, ties...)` (so groups are
    * contiguous in rank space), per-group offsets/counts from a small
    * aggregate, and a broadcast (group, p, target-rank) join picks each
    * group's `max(1, ceil(p·n_g))`-th value — percentile_disc semantics
    * per group. The scale contrast: `Window.partitionBy(group)` puts a
    * WHOLE group in one task, which for low-cardinality groups (arms,
    * tiers) is half the corpus; here no task ever holds more than its
    * range-partition share regardless of group skew.
    *
    * Output: (group, p, value), ordered by nothing (caller sorts).
    */
  def groupedExactQuantiles(df: DataFrame, groupCol: String,
                            valueCol: String, tieCols: Seq[String],
                            probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df.select(groupCol, (valueCol +: tieCols): _*)
    val ranked = globalRowNumber(proj,
      (groupCol +: valueCol +: tieCols).map(col))
    val bounds = ranked.groupBy(col(groupCol))
      .agg(min(col("rn")).as("__start"), count(lit(1)).as("__ng"))
    val ps = probs.toDF("p")
    // rename the group key on the target side: both frames descend from the
    // same ranking, and Spark's ambiguous-self-join check (rightly) rejects
    // same-named columns with shared lineage
    val targets = broadcast(bounds.crossJoin(ps)
      .select(col(groupCol).as("__grp"), col("p"),
        (col("__start") - 1 +
          greatest(lit(1L), ceil(col("p") * col("__ng")).cast("long")))
          .as("__target")))
    ranked.join(targets,
        col(groupCol) === col("__grp") && col("rn") === col("__target"))
      .select(col(groupCol), col("p"), col(valueCol).as("value"))
  }
}
