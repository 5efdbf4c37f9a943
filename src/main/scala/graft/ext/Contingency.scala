package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chi-square test of independence + Cramér's V over a two-way contingency
  * table — the categorical-association partner of [[RankCorr]] (numeric) and
  * `Experiment.mutualInfo` (information-theoretic): "does the distribution of
  * B differ across levels of A, and how strongly?" — the screen a curation
  * pipeline runs before stratifying on a metadata column (is `source`
  * independent of `lang`? is return-flag independent of brand?).
  *
  * Exactness: with integer observed counts o, row margins ra, column margins
  * cb and grand total N, each cell's χ² contribution
  * `(o − e)²/e  with  e = ra·cb/N` is algebraically
  * `(o·N − ra·cb)² / (N·ra·cb)` — an exact-integer numerator and denominator.
  * Both are built in DECIMAL, cast to double, divided once (deterministic
  * IEEE), then pooled in DECIMAL(28,12) (the `Experiment.srm` idiom) so the
  * statistic is partition-order-exact and hash-matches the oracle.
  *
  * Scale shape: one groupBy(a,b) over the scan (map-side combined; the cell
  * table is |A|×|B| rows), margins are two tiny re-aggregations of the CELL
  * table (not the scan), broadcast-joined back. Empty cells (a,b pairs never
  * observed together) still contribute `e` to χ² — handled by building the
  * full margin cross product and left-joining observed counts (o=0).
  */
object Contingency {

  /** Output: one row —
    * (n, r_levels, c_levels, dof, chi2, cramers_v) where
    * dof = (r−1)(c−1) and V = sqrt(χ² / (N·min(r−1, c−1))).
    */
  def chiSquareCramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val cb = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    // full cross product of observed levels so structurally-empty cells
    // contribute their expected mass (o=0 → term = e = ra·cb/N)
    val grid = ra.crossJoin(cb)
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
    val n = cells.agg(sum(col("o")).as("nn"),
      countDistinct(col("a")).as("r_levels"),
      countDistinct(col("b")).as("c_levels"))
    val withN = grid.crossJoin(broadcast(n))
    val dNum = (col("o").cast("decimal(19,0)") * col("nn").cast("decimal(19,0)") -
      col("ra").cast("decimal(19,0)") * col("cb").cast("decimal(19,0)"))
      .cast("double")
    val dDen = (col("nn").cast("double") * col("ra").cast("double")) *
      col("cb").cast("double")
    val term = ((dNum * dNum) / dDen).cast("decimal(28,12)")
    withN
      .select(col("nn"), col("r_levels"), col("c_levels"), term.as("t"))
      .groupBy(col("nn"), col("r_levels"), col("c_levels"))
      .agg(sum(col("t")).as("chi2d"))
      .select(
        col("nn").as("n"), col("r_levels"), col("c_levels"),
        ((col("r_levels") - 1) * (col("c_levels") - 1)).as("dof"),
        col("chi2d").cast("double").as("chi2"),
        sqrt(col("chi2d").cast("double") /
          (col("nn").cast("double") *
            least(col("r_levels") - 1, col("c_levels") - 1).cast("double")))
          .as("cramers_v"))
  }
}
