package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve sort keys and skew-salted
  * joins — the two layout levers that matter most at 100 TB.
  *
  * Z-ORDER: parquet file pruning works off per-file min/max column stats; a
  * table range-partitioned on one column prunes only on that column. Sorting
  * by the Morton (bit-interleaved) key of two columns gives every file a
  * tight min/max RECTANGLE in both dimensions, so selective predicates on
  * EITHER column skip files (the Delta/Iceberg OPTIMIZE ZORDER design). The
  * key is pure integer bit-arithmetic — codegen'd scan-side, no shuffle
  * beyond the final range partitioning.
  *
  * SALTING: a shuffle join with one giant key sends that key's every row to
  * one task. Replicating the SMALL side `saltFactor` ways and spreading the
  * big side uniformly over the replicas turns one whale task into
  * `saltFactor` even ones, at the cost of a saltFactor× copy of the small
  * side — output-identical to the plain join by construction. AQE's runtime
  * skew-split covers sort-merge joins; explicit salting remains the answer
  * when the skew is known ahead of time or the join is hash-partitioned by a
  * downstream stage.
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of x (even positions) and y
    * (odd positions). Inputs must be non-negative integers < 2^bits.
    */
  def mortonKey(x: Column, y: Column, bits: Int): Column = {
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-order locality audit: compute the Morton key of two bucketed
    * dimensions, group rows into `zvalue >> coarseBits` buckets (stand-ins
    * for files after a range-partitioned write), and report each bucket's
    * min/max per dimension. Tight per-bucket rectangles = both dimensions
    * prune. Output: (z_bucket, n, x_min, x_max, y_min, y_max).
    */
  def zorderAudit(df: DataFrame, x: Column, y: Column,
                  bits: Int, coarseBits: Int): DataFrame =
    df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .withColumn("z", mortonKey(col("x"), col("y"), bits))
      .groupBy(shiftright(col("z"), coarseBits).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))

  /** Range-partition rows by their Morton key — the write-side layout step:
    * `df.transform(zorderLayout(x, y, bits, nFiles)).write.parquet(...)`
    * gives every output file a tight min/max rectangle in BOTH dimensions
    * (each parquet footer then prunes selective predicates on either column).
    * `repartitionByRange` samples the key distribution, so files are
    * balanced even when the key space is sparse.
    */
  def zorderLayout(x: Column, y: Column, bits: Int, nFiles: Int)
                  (df: DataFrame): DataFrame =
    df.withColumn("__z", mortonKey(x.cast("long"), y.cast("long"), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Hilbert-curve locality audit: [[zorderAudit]]'s twin on the
    * [[graft.functions.HilbertXy2d]] key. Same bucket-rectangle output
    * (h_bucket, n, x_min, x_max, y_min, y_max) so the two layouts'
    * pruning quality is directly comparable — Hilbert buckets are tighter
    * because consecutive curve indices are always grid-adjacent (no
    * Morton bit-boundary jumps).
    */
  def hilbertAudit(df: DataFrame, x: Column, y: Column,
                   order: Int, coarseBits: Int): DataFrame = {
    import graft.functions.HilbertXy2d.hilbertXy2d
    df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .withColumn("h", hilbertXy2d(col("x"), col("y"), order))
      .groupBy(shiftright(col("h"), coarseBits).as("h_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** Range-partition rows by their Hilbert key — [[zorderLayout]] with the
    * better-adjacency curve (the Delta/Iceberg OPTIMIZE-by-Hilbert design).
    */
  def hilbertLayout(x: Column, y: Column, order: Int, nFiles: Int)
                   (df: DataFrame): DataFrame = {
    import graft.functions.HilbertXy2d.hilbertXy2d
    df.withColumn("__h", hilbertXy2d(x.cast("long"), y.cast("long"), order))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** One-row comparison of the two curves' locality: over the DISTINCT
    * occupied grid cells, walk each curve's visit order (rank by key, join
    * rank → rank+1 — never an unpartitioned lag window) and sum the
    * Manhattan step |dx|+|dy| between consecutive cells. Lower mean step =
    * better adjacency = tighter file rectangles at any file count. On a
    * FULL 2^order × 2^order grid the Hilbert mean is exactly 1 (every step
    * adjacent); Morton's bit-boundary jumps push it well above. Exact
    * integer sums; one double division at the readout. Output: (n_cells,
    * hilbert_step_sum, morton_step_sum, hilbert_avg_step, morton_avg_step).
    */
  def curveLocality(df: DataFrame, x: Column, y: Column,
                    order: Int): DataFrame = {
    import graft.functions.HilbertXy2d.hilbertXy2d
    val cells = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .distinct()
      .withColumn("h", hilbertXy2d(col("x"), col("y"), order))
      .withColumn("z", mortonKey(col("x"), col("y"), order))
    def stepSum(key: String): DataFrame = {
      val ranked = GlobalRank.globalRowNumber(
        cells.select(col("x"), col("y"), col(key)), Seq(col(key)))
      ranked.select(col("x"), col("y"), col("rn"))
        .join(ranked.select(col("x").as("x2"), col("y").as("y2"),
          (col("rn") - 1).as("rn")), "rn")
        .agg(count(lit(1)).as("n_pairs"),
          sum((abs(col("x2") - col("x")) + abs(col("y2") - col("y")))
            .cast("long")).as(s"${key}_sum"))
    }
    val h = stepSum("h")
    val z = stepSum("z")
    val n = cells.agg(count(lit(1)).as("n_cells"))
    n.crossJoin(h.select(col("h_sum"))).crossJoin(z.select(col("z_sum")))
      .select(col("n_cells"),
        col("h_sum").as("hilbert_step_sum"),
        col("z_sum").as("morton_step_sum"),
        round(col("h_sum").cast("double") /
          (col("n_cells") - 1).cast("double"), 6).as("hilbert_avg_step"),
        round(col("z_sum").cast("double") /
          (col("n_cells") - 1).cast("double"), 6).as("morton_avg_step"))
  }

  /** Skew-salted equi-join: replicate the small (dimension) side
    * `saltFactor` ways, spread the big (fact) side across replicas by a
    * deterministic hash of its whole row, and join on (key, salt). Output
    * rows are exactly those of `big.join(small, keys)` — the salt is a pure
    * partitioning trick that never changes the match set.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    val salted = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val spread = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    spread.join(salted, keys :+ "__salt").drop("__salt")
  }

  /** Prefix-compression estimate of a sort layout: the average common-prefix
    * length between CONSECUTIVE rows of a string column under a given total
    * order, vs under the table's natural key order — the gap is the
    * delta/prefix-encoding savings a `sortWithinPartitions` layout buys in
    * parquet/ORC dictionaries (the read-bandwidth sibling of [[zorderAudit]]'s
    * row-group pruning).
    *
    * Neighbor pairing is [[GlobalRank.globalRowNumber]] + an rn+1 equi-join —
    * never an unpartitioned lag window (the [[graft.plans.ScaleGuard]]
    * contract); prefixes come from the native codegen
    * `common_prefix_len(a, b)` kernel. All sums are exact integers. Output:
    * 1 row (n_pairs, avg_len, avg_prefix_sorted, avg_prefix_natural,
    * savings_sorted, savings_natural) — savings = avg_prefix/avg_len.
    */
  def prefixCompressionStats(df: DataFrame, strCol: String,
                             naturalKey: Column): DataFrame = {
    import graft.functions.CommonPrefixLen.commonPrefixLen
    def avgPrefix(order: Seq[Column]): DataFrame = {
      val ranked = GlobalRank.globalRowNumber(
        df.select(col(strCol).as("__s"), naturalKey.as("__k")), order)
      ranked.select(col("__s"), col("rn"))
        .join(ranked.select(col("__s").as("__t"), (col("rn") - 1).as("rn")),
          "rn")
        .agg(count(lit(1)).as("n_pairs"),
          sum(length(col("__s")).cast("long")).as("sum_len"),
          sum(commonPrefixLen(col("__s"), col("__t")).cast("long"))
            .as("sum_prefix"))
    }
    val sorted = avgPrefix(Seq(col("__s"), col("__k")))
    val natural = avgPrefix(Seq(col("__k")))
      .select(col("sum_prefix").as("nat_prefix"), col("sum_len").as("nat_len"))
    sorted.crossJoin(natural)
      .select(col("n_pairs"),
        round(col("sum_len").cast("double") / col("n_pairs"), 6)
          .as("avg_len"),
        round(col("sum_prefix").cast("double") / col("n_pairs"), 6)
          .as("avg_prefix_sorted"),
        round(col("nat_prefix").cast("double") / col("n_pairs"), 6)
          .as("avg_prefix_natural"),
        round(col("sum_prefix").cast("double") / col("sum_len"), 6)
          .as("savings_sorted"),
        round(col("nat_prefix").cast("double") / col("nat_len"), 6)
          .as("savings_natural"))
  }

  /** Zone-map (min/max) skipping audit — why sorting/clustering a table on
    * its filter column is a 10-100× scan saver: chunk the table (simulated
    * row groups) under NATURAL order vs VALUE-SORTED order, record each
    * chunk's min/max of the predicate column, and count the chunks a range
    * predicate could skip entirely (`max < lo OR min > hi` — exactly the
    * parquet row-group pruning test). Under natural order nearly every
    * chunk straddles the range; value-sorted, all but the boundary chunks
    * skip. The quantitative companion of [[zorderAudit]] for ONE column.
    *
    * Both chunkings ride [[GlobalRank.globalRowNumber]] (no single-task
    * window); `chunk = (rn−1)·C div N`. All comparisons are raw column
    * values — no floats introduced.
    *
    * Output per layout asc: (layout, n_chunks, n_skippable, skip_fraction).
    */
  def zoneMapSkipAudit(df: DataFrame, valueCol: String,
                       naturalOrder: Seq[String], chunks: Int,
                       lo: Double, hi: Double): DataFrame = {
    require(chunks >= 2, s"chunks ($chunks) must be >= 2")
    require(lo <= hi, s"empty predicate range [$lo, $hi]")
    val proj = df.select((valueCol +: naturalOrder).map(col): _*)
    val total = proj.count()
    def audit(label: String, order: Seq[String]): DataFrame = {
      val ranked = GlobalRank.globalRowNumber(proj, order.map(col))
      ranked
        .withColumn("chunk", expr(s"((rn - 1) * $chunks) div $total"))
        .groupBy(col("chunk"))
        .agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("mx") < lo || col("mn") > hi, 1L).otherwise(0L))
            .as("n_skippable"))
        .select(lit(label).as("layout"), col("n_chunks"), col("n_skippable"),
          (col("n_skippable").cast("double") / col("n_chunks"))
            .as("skip_fraction"))
    }
    audit("natural", naturalOrder)
      .unionByName(audit("sorted", valueCol +: naturalOrder))
      .orderBy(col("layout"))
  }

  /** Clustering-depth audit (the Snowflake `SYSTEM$CLUSTERING_DEPTH`
    * metric): how many files' [min, max] ranges stab a given point of the
    * clustering column. Depth 1 = perfectly clustered (a point predicate
    * reads one file); depth ≈ #files = every file overlaps everything (a
    * point predicate reads them all). Both layouts are assigned in a
    * SINGLE scan via one explode generator (a union of two projections
    * would re-run the base pipeline per branch — the AQE shared-subtree
    * trap), and the depth comes from a boundary sweep: per-bucket
    * intervals → (value, ±1) events aggregated by value → a running sum
    * read at each bucket's start. With events pre-aggregated per (layout,
    * value, type) the sweep is deterministic, and its window runs over ≤
    * 4·#buckets post-aggregation rows — metadata-sized, never the data.
    * Inclusive overlap: an end at value v is subtracted only AFTER starts
    * at v (type orders starts first). Output: (layout, depth, n_buckets).
    */
  def clusteringDepth(df: DataFrame, value: Column,
                      sortedBucket: Column, naturalBucket: Column)
      : DataFrame = {
    val rows = df.select(value.cast("long").as("v"),
        explode(array(
          struct(lit("sorted").as("layout"),
            sortedBucket.cast("long").as("bucket")),
          struct(lit("natural").as("layout"),
            naturalBucket.cast("long").as("bucket")))).as("lb"))
      .select(col("v"), col("lb.layout").as("layout"),
        col("lb.bucket").as("bucket"))
    val intervals = rows.groupBy(col("layout"), col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val events = intervals.select(col("layout"),
        explode(array(
          struct(col("lo").as("v"), lit(0).as("typ"), lit(1L).as("delta")),
          struct(col("hi").as("v"), lit(1).as("typ"), lit(-1L).as("delta"))))
          .as("e"))
      .groupBy(col("layout"), col("e.v").as("v"), col("e.typ").as("typ"))
      .agg(sum(col("e.delta")).as("delta"))
    val sweep = events.withColumn("depth",
      sum(col("delta")).over(Window.partitionBy(col("layout"))
        .orderBy(col("v"), col("typ"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val startDepth = sweep.filter(col("typ") === 0)
      .select(col("layout").as("s_layout"), col("v").as("s_v"), col("depth"))
    intervals
      .join(startDepth,
        col("layout") === col("s_layout") && col("lo") === col("s_v"))
      .groupBy(col("layout"), col("depth"))
      .agg(count(lit(1)).as("n_buckets"))
  }
}
