package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** V-OPTIMAL histogram construction (Jagadish, Koudas, Muthukrishnan,
  * Poosala, Sevcik & Suel, "Optimal histograms with quality guarantees",
  * VLDB 1998): choose B bucket boundaries minimizing the total
  * within-bucket variance (SSE) — the histogram a cost-based optimizer
  * wants for selectivity estimation, provably better than equi-width/
  * equi-depth on skewed columns.
  *
  * Pipeline: one distributed pass pre-buckets the column into ≤ `cells`
  * equi-width cells with integer moment sums (cnt, Σv, Σv²); everything
  * after runs on that metadata-sized table. The cell table is BOUNDED BY
  * CONTRACT (`require(cells <= 256)`), so the prefix sums, the classic
  * O(B·cells²) dynamic program and the backtrack run on the DRIVER over
  * the ≤ 256 collected rows (r16; the adcTopK size-gate pattern — the
  * pre-r16 form ran the DP as B−1 single-partition checkpoint jobs plus a
  * chain of relational backtrack joins, ~10 Spark jobs of pure scheduling
  * overhead around microseconds of arithmetic).
  *
  * Exactness (unchanged from the relational form, and pinned by the same
  * oracle): every segment cost is ONE fixed double formula over exact
  * integer prefix differences — (ds2·dn − ds1²)/dn with the numerator in
  * exact integer space (BigInt here, DECIMAL(38,0) in the oracle; both
  * convert to double with IEEE round-to-nearest) and ONE double division —
  * and DP accumulation follows the recursion's fixed tree (cost =
  * prev + seg, MIN over identically-computed doubles), so both engines
  * produce identical doubles; argmin ties break on the smaller split
  * index via a two-step (min cost, then min k at that cost). The final
  * ROUND(sse, 2) is evaluated by Spark's own round in the returned plan,
  * not by the JVM.
  *
  * Scale shape: the only corpus-sized stage is the first groupBy (map-
  * side combinable, ≤ `cells` groups); what crosses to the driver is the
  * ≤ 256-row moment table, never data.
  */
object VOptimal {

  /** Build the B-bucket V-optimal histogram of `valueCol` (cast to long)
    * over a `cells`-cell equi-width pre-bucketing. Output per bucket,
    * ordered: (bucket, lo_cell, hi_cell, n_rows, sse) — lo/hi are
    * inclusive pre-bucket cell ids, sse the exact sum of squared
    * deviations of the RAW values inside the bucket (computed from the
    * cells' integer moment sums; pre-bucketing only restricts WHERE
    * boundaries may fall, not what the cost measures).
    */
  def histogram(df: DataFrame, valueCol: String, cells: Int,
                buckets: Int): DataFrame = {
    require(cells >= 2 && cells <= 256, s"cells must be 2..256, got $cells")
    require(buckets >= 2 && buckets <= 16,
      s"buckets must be 2..16, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("long").as("v"))
    val mm = vals.agg(min(col("v")).as("minv"), max(col("v")).as("maxv"))
    // the single corpus-sized job; ≤ `cells` rows come back
    val cellRows = vals.crossJoin(broadcast(mm))
      .selectExpr(s"((v - minv) * $cells) div (maxv - minv + 1) AS cell",
        "v")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .orderBy(col("cell"))
      .collect()

    val c = cellRows.length
    val cellId = cellRows.map(_.getLong(0))
    // prefix sums in the same BIGINT space the window computed
    val pn = new Array[Long](c); val ps1 = new Array[Long](c)
    val ps2 = new Array[Long](c)
    var acc0 = 0L; var acc1 = 0L; var acc2 = 0L
    var x = 0
    while (x < c) {
      acc0 += cellRows(x).getLong(1); acc1 += cellRows(x).getLong(2)
      acc2 += cellRows(x).getLong(3)
      pn(x) = acc0; ps1(x) = acc1; ps2(x) = acc2
      x += 1
    }
    // sentinel k = −1 reads as all-zero prefixes (the old preS row)
    def pnAt(k: Int) = if (k < 0) 0L else pn(k)
    def ps1At(k: Int) = if (k < 0) 0L else ps1(k)
    def ps2At(k: Int) = if (k < 0) 0L else ps2(k)
    // SSE = (ds2·dn − ds1²)/dn, numerator exact, ONE double division —
    // ds1² reaches ~1e18 where engine double products diverge by ulps
    def seg(i: Int, k: Int): Double = {
      val dn = pn(i) - pnAt(k)
      val ds1 = BigInt(ps1(i)) - BigInt(ps1At(k))
      val num = (BigInt(ps2(i)) - BigInt(ps2At(k))) * BigInt(dn) - ds1 * ds1
      num.toDouble / dn.toDouble
    }

    // dp level 1: one bucket over 0..i (split k = −1)
    val NoK = Int.MinValue
    var dpCost = Array.tabulate(c)(i => seg(i, -1))
    // level-1 split choice only (the backtrack reads levelK/levelDef; later
    // levels' choices live in levelK, so no running dpK is kept)
    val dpK = Array.fill(c)(-1)
    var dpDef = Array.fill(c)(true)
    // per level, the (i → k) split choice for the backtrack
    val levelK = Array.ofDim[Int](buckets + 1, c)
    levelK(1) = dpK.clone()
    val levelDef = Array.ofDim[Boolean](buckets + 1, c)
    levelDef(1) = dpDef.clone()
    for (j <- 2 to buckets) {
      val nc = new Array[Double](c); val nk = Array.fill(c)(NoK)
      val nd = new Array[Boolean](c)
      var i = 0
      while (i < c) {
        var mcost = Double.PositiveInfinity
        var found = false
        var k = 0
        while (k < i) {
          if (dpDef(k)) {
            val cost = dpCost(k) + seg(i, k)
            if (!found || cost < mcost) { mcost = cost; found = true }
          }
          k += 1
        }
        if (found) {
          // min k at exactly the min cost — the relational tie-break
          var bk = NoK; k = 0
          while (k < i && bk == NoK) {
            if (dpDef(k) && dpCost(k) + seg(i, k) == mcost) bk = k
            k += 1
          }
          nc(i) = mcost; nk(i) = bk; nd(i) = true
        }
        i += 1
      }
      dpCost = nc; dpDef = nd
      levelK(j) = nk.clone(); levelDef(j) = nd.clone()
    }

    // backtrack from the last cell at level `buckets`
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Double)]
    var bi = c - 1
    var j = buckets
    while (j >= 1 && bi >= 0 && levelDef(j)(bi)) {
      val k = levelK(j)(bi)
      out += ((j, cellId(k + 1), cellId(bi), pn(bi) - pnAt(k), seg(bi, k)))
      bi = k
      j -= 1
    }
    out.sortBy(_._1).toSeq
      .toDF("bucket", "lo_cell", "hi_cell", "n_rows", "sse")
      .select(col("bucket"), col("lo_cell"), col("hi_cell"), col("n_rows"),
        // ROUND(,2): sse magnitudes reach ~1e11, where a 1e-6 increment
        // sits below double ulp and ROUND(,6) lands on adjacent doubles
        round(col("sse"), 2).as("sse"))
      .orderBy(col("bucket"))
  }
}
