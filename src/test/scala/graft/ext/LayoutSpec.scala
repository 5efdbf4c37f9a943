package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("mortonKey: golden bit interleave") {
    // x=0b101 (5), y=0b011 (3) -> z bits x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0
    // z = 1 + 2 + 8 + 16 = 27
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(r == 27L)
  }

  test("mortonKey: monotone on the diagonal and bounded") {
    val df = spark.range(0, 64).select(
      col("id").as("x"), col("id").as("y"))
    val zs = df.select(Layout.mortonKey(col("x"), col("y"), 6).as("z"))
      .orderBy(col("z")).as[Long].collect()
    assert(zs.length == 64 && zs.head == 0L && zs.last < (1L << 12))
    assert(zs.toSet.size == 64) // interleave is injective
  }

  test("zorderAudit: buckets cover tight rectangles") {
    // full 16x16 grid, 4 bits, coarse 4 -> each bucket is a 4x... rectangle:
    // 2^4 z-values per bucket = a 4x4 tile (2 bits of x, 2 bits of y)
    val grid = spark.range(0, 16).select(col("id").as("x"))
      .crossJoin(spark.range(0, 16).select(col("id").as("y")))
    val audit = Layout.zorderAudit(grid, col("x"), col("y"), bits = 4, coarseBits = 4)
      .collect()
    assert(audit.length == 16)
    audit.foreach { r =>
      assert(r.getAs[Long]("n") == 16)
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") == 3)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") == 3)
    }
  }

  test("zorderLayout: a y-selective predicate prunes z files, not x-range files") {
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val grid = spark.range(0, 64).select(col("id").as("x"))
      .crossJoin(spark.range(0, 64).select(col("id").as("y")))
    // per-file min/max rectangles — exactly what parquet footer stats expose
    def rects(df: org.apache.spark.sql.DataFrame, path: String) = {
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(fmin(col("x")).as("x0"), fmax(col("x")).as("x1"),
          fmin(col("y")).as("y0"), fmax(col("y")).as("y1"))
        .select("x0", "x1", "y0", "y1").as[(Long, Long, Long, Long)]
        .collect().toSeq
    }
    val dir = graft.Scratch.register(
      java.nio.file.Files.createTempDirectory("zorder").toString)
    val z = rects(
      grid.transform(Layout.zorderLayout(col("x"), col("y"), bits = 6, nFiles = 16)),
      s"$dir/zordered")
    // baseline: same file count, range-partitioned on the PRIMARY column only
    val xOnly = rects(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")),
      s"$dir/byprimary")
    assert(z.size == 16 && xOnly.size == 16)
    // single-dim layout: every file spans the FULL y range -> y never prunes
    assert(xOnly.forall { case (_, _, y0, y1) => y0 == 0 && y1 == 63 })
    // a file "matches" a predicate iff its stats rectangle intersects it —
    // the footer-pruning rule. y = 5 must skip most z files and no x files.
    def matching(rs: Seq[(Long, Long, Long, Long)], y: Long) =
      rs.count { case (_, _, y0, y1) => y0 <= y && y <= y1 }
    assert(matching(xOnly, 5L) == 16)
    assert(matching(z, 5L) <= 8,
      s"z-order y-extents too loose: ${z.map(r => (r._3, r._4)).sorted}")
    // and x stays prunable too (not traded away): most z files skip x = 5
    def matchingX(rs: Seq[(Long, Long, Long, Long)], x: Long) =
      rs.count { case (x0, x1, _, _) => x0 <= x && x <= x1 }
    assert(matchingX(z, 5L) <= 8)
  }

  test("saltedJoin: output-identical to the plain join, including dup keys") {
    val big = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (1L, "e"))
      .toDF("k", "payload")
    val small = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "attr")
    val salted = Layout.saltedJoin(big, small, Seq("k"), saltFactor = 4)
      .select("k", "payload", "attr").as[(Long, String, String)].collect().sorted
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "attr").as[(Long, String, String)].collect().sorted
    assert(salted.sameElements(plain) && plain.length == 7)
  }

  test("saltedJoin spreads a hot key across shuffle partitions " +
    "(measured on task shuffle-read metrics, not wall time)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // 50k-row fact side with 90% of rows on ONE key — the shape where an
    // unsalted shuffle join puts ~all the data in a single reducer task
    val nRows = 50000
    val big = spark.range(nRows.toLong)
      .select((when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 1000))
        .as("k"), col("id").as("payload"))
    val small = spark.range(1000L).select(col("id").as("k"),
      concat(lit("attr_"), col("id")).as("attr"))

    def maxTaskShuffleReadRecords(job: => Long): (Long, Long) = {
      val maxRead = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null)
            maxRead.getAndUpdate(c =>
              math.max(c, m.shuffleReadMetrics.recordsRead))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val rows = job
        org.apache.spark.GraftTestBridge
          .waitUntilListenerBusEmpty(spark.sparkContext)
        (rows, maxRead.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    // force the skew to be visible: no AQE rebalancing, no broadcast escape —
    // the production regime this guards is a dim side too big to broadcast
    // 32 shuffle partitions so the 4 salt groups rarely collide into one
    // reducer (the suite default of 4 partitions would re-merge them)
    val confs = Seq("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32")
    val saved = confs.map { case (key, _) => key -> spark.conf.get(key) }
    confs.foreach { case (key, v) => spark.conf.set(key, v) }
    try {
      val (nPlain, maxPlain) = maxTaskShuffleReadRecords(
        big.join(small, Seq("k")).count())
      val (nSalted, maxSalted) = maxTaskShuffleReadRecords(
        Layout.saltedJoin(big, small, Seq("k"), saltFactor = 4).count())
      assert(nPlain == nSalted && nPlain == nRows.toLong)
      // unsalted: the hot key's reducer reads ~45k records; salted by 4 the
      // worst task carries ~1/4 of that (plus the small side's replicas)
      assert(maxPlain >= (nRows * 9) / 10,
        s"fixture not skewed as designed: maxPlain=$maxPlain")
      info(s"hot-reducer shuffle-read records: unsalted=$maxPlain salted=$maxSalted")
      assert(maxSalted * 2 <= maxPlain,
        s"salting did not spread the hot key: $maxSalted vs $maxPlain")
    } finally saved.foreach { case (key, v) => spark.conf.set(key, v) }
  }

  test("prefixCompressionStats: a sorted layout shares long prefixes where " +
    "a shuffled natural order shares almost none") {
    import spark.implicits._
    // 100 strings in 4 families; natural key deliberately interleaves them
    val rows = (0 until 100).map { i =>
      val fam = Seq("alpha", "bravo", "charlie", "delta")(i % 4)
      (f"${fam}_item_$i%03d", i.toLong)
    }
    val df = rows.toDF("s", "k")
    val out = Layout.prefixCompressionStats(df, "s", col("k")).collect().head
    assert(out.getLong(0) == 99)
    val sortedSav = out.getDouble(4)
    val naturalSav = out.getDouble(5)
    // sorted: neighbors share "<family>_item_0xx" stems; natural: the
    // interleave flips family every row, killing the shared prefix
    assert(sortedSav > naturalSav + 0.3,
      s"sorted $sortedSav should beat natural $naturalSav")
  }

  test("hilbertAudit: full-grid buckets are tight square tiles") {
    // full 16x16 grid, order 4, coarse 4 -> 16 d-values per bucket = one
    // 4x4 tile (Hilbert subdivides into quadrants, so each 16-run of d is
    // exactly one 4x4 sub-square)
    val grid = spark.range(0, 16).select(col("id").as("x"))
      .crossJoin(spark.range(0, 16).select(col("id").as("y")))
    val audit = Layout.hilbertAudit(grid, col("x"), col("y"),
      order = 4, coarseBits = 4).collect()
    assert(audit.length == 16)
    audit.foreach { r =>
      assert(r.getAs[Long]("n") == 16)
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") == 3)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") == 3)
    }
  }

  test("curveLocality: on a full grid the Hilbert mean step is exactly 1 " +
    "and Morton's bit-boundary jumps push its mean above") {
    val grid = spark.range(0, 16).select(col("id").as("x"))
      .crossJoin(spark.range(0, 16).select(col("id").as("y")))
    val r = Layout.curveLocality(grid, col("x"), col("y"), order = 4)
      .collect().head
    assert(r.getAs[Long]("n_cells") == 256)
    assert(r.getAs[Long]("hilbert_step_sum") == 255) // every step adjacent
    assert(r.getAs[Double]("hilbert_avg_step") == 1.0)
    assert(r.getAs[Double]("morton_avg_step") > 1.5,
      s"morton mean ${r.getAs[Double]("morton_avg_step")} should jump")
  }

  test("clusteringDepth: disjoint sorted buckets are all depth 1; " +
    "round-robin buckets stack to closed-form depths 1..10") {
    // values 0..99: sorted bucket v/10 -> 10 disjoint [10i, 10i+9] ranges;
    // natural bucket v%10 -> bucket i spans [i, 90+i], so at bucket i's
    // start exactly the i+1 buckets j <= i cover it -> one bucket per depth
    val df = spark.range(0, 100).select(col("id").as("v"))
    val got = Layout.clusteringDepth(df, col("v"),
        expr("v div 10"), pmod(col("v"), lit(10)))
      .orderBy("layout", "depth")
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("depth"),
        r.getAs[Long]("n_buckets")))
    val natural = (1L to 10L).map(d => ("natural", d, 1L))
    assert(got.toSeq == natural :+ (("sorted", 1L, 10L)))
  }
}
