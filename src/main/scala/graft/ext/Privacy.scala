package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk audits for training-data release: k-anonymity
  * (Sweeney) and l-diversity (Machanavajjhala et al.) over quasi-identifier
  * columns. The companion of the redaction path (`TextQuality.piiRedact`
  * masks direct identifiers; this measures what the REMAINING columns still
  * leak through linkage).
  *
  * Scale shape: one hash aggregation on the quasi-identifier tuple — the
  * same cost envelope as any groupBy-count, map-side combined, no joins. The
  * distinct-sensitive count rides the same shuffle as a two-level aggregate
  * (exact, not a sketch — an at-risk audit must not under-count a class).
  */
object Privacy {

  /** Per-equivalence-class audit: group `df` by `quasiIds`, report class
    * size (k-anonymity: every class below `k` is linkable), the number of
    * distinct `sensitive` values (l-diversity: a class where every member
    * shares one sensitive value leaks it even at large k), and both risk
    * flags. Output: quasi-id columns + `class_size`, `l_diversity`,
    * `k_at_risk`, `l_at_risk`.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[Column], sensitive: Column,
                 k: Int, l: Int): DataFrame =
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_diversity"))
      .withColumn("k_at_risk", col("class_size") < k)
      .withColumn("l_at_risk", col("l_diversity") < l)

  /** One-row release gate over [[kAnonymity]]'s class table: the dataset's
    * k-anonymity level (min class size), diversity level (min distinct
    * sensitive), and how many ROWS sit in at-risk classes — the number a
    * release decision actually turns on (classes are not people).
    */
  def kAnonymitySummary(classes: DataFrame): DataFrame =
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("class_size")).as("n_rows"),
      min(col("class_size")).as("k_anonymity"),
      min(col("l_diversity")).as("l_level"),
      sum(when(col("k_at_risk"), col("class_size")).otherwise(lit(0L)))
        .as("rows_k_at_risk"),
      sum(when(col("l_at_risk"), col("class_size")).otherwise(lit(0L)))
        .as("rows_l_at_risk"))
}
