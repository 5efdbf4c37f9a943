package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Intra-list similarity (ILS) — per group (= per user's recommendation list), the mean
  * pairwise cosine similarity among the list's items, each item represented by its
  * feature vector built from the group's own rows.
  *
  * Reference: `intra_list_similarities`
  * (/root/reference/recmetrics_pyspark/recmetrics_pyspark.py:415-432) — pandas-only:
  * `groupby(col_group).apply` pivots each group (`pivot_table(index, columns, values)`,
  * default aggfunc **mean** — :177-181) and runs sklearn `cosine_similarity`; the
  * double sign-flip (`1 − personalization_pandas` at :431, which itself returns
  * `1 − mean`, :188) makes ILS the mean similarity — higher = less diverse
  * (SURVEY.md §2.4.6). We make it distributed: a within-group self-join on the feature
  * key yields the pairwise dots; zero-overlap pairs contribute similarity 0 but still
  * count in the denominator (the pivot's `fillna(0)` semantics).
  *
  * Groups with a single item have no pairs — the reference's closed form divides by
  * n(n−1) = 0 (NaN); we exclude them (documented deviation, keeps output well-defined).
  */
object IntraList {

  /** Per-group ILS. Output: (colGroup, n_items, ils) — unrounded, groups with ≥2 items. */
  def intraListSimilarity(df: DataFrame, colGroup: String, colIndex: String,
                          colColumns: String, colValues: String): DataFrame = {
    // pandas pivot_table default aggfunc='mean' over duplicate (index, columns) cells.
    // No explicit cache: f's aggregation exchange appears on both self-join sides and
    // under the norm aggregate, and Catalyst's ReuseExchange computes it once per job.
    // (An explicit .cache() here measurably HURT: the columnar cache build ran inside
    // AQE's concurrent stage materialization — see SCALE.md "cache policy".)
    val f = df.groupBy(col(colGroup), col(colIndex), col(colColumns))
      .agg(avg(col(colValues)).as("v"))
    val norms = f.groupBy(col(colGroup), col(colIndex))
      .agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
    val nItems = norms.groupBy(col(colGroup)).agg(count(lit(1)).as("n_items"))

    val a = f.select(col(colGroup).as("g"), col(colIndex).as("i1"),
      col(colColumns).as("c"), col("v").as("va"))
    val b = f.select(col(colGroup).as("g"), col(colIndex).as("i2"),
      col(colColumns).as("c"), col("v").as("vb"))
    val sims = a.join(b, Seq("g", "c"))
      .filter(col("i1") < col("i2"))
      .groupBy(col("g"), col("i1"), col("i2"))
      .agg(sum(col("va") * col("vb")).as("dot"))
      .join(norms.select(col(colGroup).as("g"), col(colIndex).as("i1"), col("nrm").as("n1")),
        Seq("g", "i1"))
      .join(norms.select(col(colGroup).as("g"), col(colIndex).as("i2"), col("nrm").as("n2")),
        Seq("g", "i2"))
      .groupBy(col("g"))
      .agg(sum(col("dot") / (col("n1") * col("n2"))).as("sum_sim"))

    nItems.filter(col("n_items") >= 2)
      .join(sims.withColumnRenamed("g", colGroup), Seq(colGroup), "left")
      .select(
        col(colGroup), col("n_items"),
        (coalesce(col("sum_sim"), lit(0.0)) /
          (col("n_items") * (col("n_items") - lit(1)) / lit(2.0))).as("ils"))
  }

  /** Global ILS = mean of the per-group column (notebook cell 92). */
  def globalIls(df: DataFrame, colGroup: String, colIndex: String,
                colColumns: String, colValues: String): Double =
    intraListSimilarity(df, colGroup, colIndex, colColumns, colValues)
      .agg(avg(col("ils"))).first().getDouble(0)
}
