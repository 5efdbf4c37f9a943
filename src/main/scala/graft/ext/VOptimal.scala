package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * after runs on that metadata-sized table — prefix sums, then the
  * classic O(B·cells²) dynamic program as B−1 bounded theta-joins
  * (candidate splits × ends), then a RELATIONAL backtrack (B chained
  * 1-row joins), never a driver-side matrix.
  *
  * Exactness: every segment cost is ONE fixed double formula over exact
  * integer prefix differences — ds2 − ds1²/dn — and DP accumulation
  * follows the recursion's fixed tree, so both engines produce identical
  * doubles; argmin ties break on the smaller split index via a
  * two-step (min cost, then min k at that cost) that only compares
  * identically-computed doubles.
  *
  * Scale shape: the only corpus-sized stage is the first groupBy (map-
  * side combinable, ≤ `cells` groups). DP tables are single-partition
  * checkpoints of ≤ cells rows; each level is one join bounded by
  * cells²/2 rows.
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
    val vals = df.select(col(valueCol).cast("long").as("v"))
    val mm = vals.agg(min(col("v")).as("minv"), max(col("v")).as("maxv"))
    val cellTable = vals.crossJoin(broadcast(mm))
      .selectExpr(s"((v - minv) * $cells) div (maxv - minv + 1) AS cell",
        "v")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .repartition(1)
    // prefix sums over the ≤cells-row table, with a −1 sentinel of zeros
    val wAll = Window.orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = cellTable
      .withColumn("idx", row_number().over(Window.orderBy(col("cell"))) - 1)
      .withColumn("pn", sum(col("cnt")).over(wAll))
      .withColumn("ps1", sum(col("s1")).over(wAll))
      .withColumn("ps2", sum(col("s2")).over(wAll))
      .select(col("idx").cast("long").as("idx"), col("cell"), col("pn"),
        col("ps1"), col("ps2"))
      .localCheckpoint(eager = true)
    val sentinel = pre.sparkSession.range(1).select(lit(-1L).as("idx"),
      lit(0L).as("pn"), lit(0L).as("ps1"), lit(0L).as("ps2"))
    val preS = pre.select(col("idx"), col("pn"), col("ps1"), col("ps2"))
      .unionByName(sentinel)
      .repartition(1).localCheckpoint(eager = true)
    // SSE = (ds2·dn − ds1²)/dn with the numerator in exact DECIMAL(38,0)
    // and ONE double division — ds1² reaches ~1e18, where engine double
    // products diverge by ulps (the q_haar_energy lesson: keep transforms
    // integer/DECIMAL, divide once at the readout). The dn > 0 guard
    // never fires on surviving rows (the theta join requires i > k and
    // every cell is non-empty) — it exists because whole-stage codegen
    // fuses this projection into the nested-loop join's consume path,
    // where ANSI division-by-zero would trip on pairs the i > k
    // condition is about to discard.
    def seg(pnI: String, ps1I: String, ps2I: String, pnK: String,
            ps1K: String, ps2K: String): org.apache.spark.sql.Column =
      expr(s"CASE WHEN $pnI - $pnK > 0 THEN " +
        s"CAST(CAST($ps2I - $ps2K AS DECIMAL(38,0)) * ($pnI - $pnK) - " +
        s"CAST($ps1I - $ps1K AS DECIMAL(38,0)) * ($ps1I - $ps1K)" +
        s" AS DOUBLE) / CAST($pnI - $pnK AS DOUBLE) ELSE 0.0d END")
    // dp level 1: one bucket over 0..i (split k = −1)
    var dp = pre.select(col("idx").as("i"),
        seg("pn", "ps1", "ps2", "0", "0", "0").as("cost"),
        lit(-1L).as("k"))
      .repartition(1).localCheckpoint(eager = true)
    var splits = Seq(dp.select(lit(1).as("j"), col("i"), col("k")))
    for (j <- 2 to buckets) {
      val cand = dp.select(col("i").as("k"), col("cost").as("prev"))
        .join(preS.select(col("idx").as("k"), col("pn").as("kpn"),
          col("ps1").as("kps1"), col("ps2").as("kps2")), Seq("k"))
        .join(pre.select(col("idx").as("i"), col("pn"), col("ps1"),
          col("ps2")), col("i") > col("k"))
        .select(col("i"), col("k"),
          (col("prev") +
            seg("pn", "ps1", "ps2", "kpn", "kps1", "kps2")).as("cost"))
      val mins = cand.groupBy(col("i")).agg(min(col("cost")).as("mcost"))
      dp = cand.join(mins, Seq("i"))
        .filter(col("cost") === col("mcost"))
        .groupBy(col("i")).agg(min(col("k")).as("k"),
          min(col("cost")).as("cost"))
        .select(col("i"), col("cost"), col("k"))
        .repartition(1).localCheckpoint(eager = true)
      splits = splits :+ dp.select(lit(j).as("j"), col("i"), col("k"))
    }
    val splitAll = splits.reduce(_ unionByName _)
    val lastIdx = pre.agg(max(col("idx")).as("li"))
    // relational backtrack: bt(j = buckets) anchored at the last cell
    var bt = splitAll.filter(col("j") === buckets)
      .join(broadcast(lastIdx), col("i") === col("li"))
      .select(col("j"), col("i"), col("k"))
    var chain = Seq(bt)
    for (j <- (buckets - 1) to 1 by -1) {
      bt = splitAll.filter(col("j") === j)
        .join(bt.select(col("k").as("nexti")), col("i") === col("nexti"))
        .select(col("j"), col("i"), col("k"))
      chain = chain :+ bt
    }
    val ranges = chain.reduce(_ unionByName _)
    ranges
      .join(preS.select(col("idx").as("k"), col("pn").as("kpn"),
        col("ps1").as("kps1"), col("ps2").as("kps2")), Seq("k"))
      .join(pre.select(col("idx").as("i"), col("cell").as("hi_cell"),
        col("pn"), col("ps1"), col("ps2")), Seq("i"))
      .join(pre.select((col("idx") - 1).as("k"), col("cell").as("lo_cell")),
        Seq("k"))
      .select(col("j").as("bucket"), col("lo_cell"), col("hi_cell"),
        (col("pn") - col("kpn")).as("n_rows"),
        // ROUND(,2): sse magnitudes reach ~1e11, where a 1e-6 increment
        // sits below double ulp and ROUND(,6) lands on adjacent doubles
        round(seg("pn", "ps1", "ps2", "kpn", "kps1", "kps2"), 2).as("sse"))
      .orderBy(col("bucket"))
  }
}
