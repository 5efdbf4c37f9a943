package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mixture design: temperature-scaled sampling weights per corpus
  * source — the multinomial α-smoothing recipe (XLM-R / mT5: sample source s
  * with probability ∝ p_s^α, α < 1 upweights small sources) that turns raw
  * corpus sizes into the sampling distribution a data loader consumes.
  *
  * Scale shape: one source-keyed aggregate shrinks the corpus to |sources|
  * rows; the two scalar normalizers (total size, Σ p^α) are 1-row aggregates
  * broadcast back — the corpus itself is scanned exactly once. The tiny
  * per-source frame is checkpointed because three branches read it. The p^α
  * terms sum as DECIMAL so source order can't flip low bits.
  */
object Mixing {

  /** Per-source mixture weights. Output: (source, n_docs, n_units, share,
    * weight, epochs) where `share` is the source's fraction of `sizeCol`
    * mass, `weight` the temperature-scaled sampling probability, and
    * `epochs` = weight·total/n_units — how many passes over the source one
    * full weighted corpus pass implies (>1 = upsampled, <1 = subsampled).
    */
  def temperatureWeights(docs: DataFrame, sourceCol: String, sizeCol: String,
                         alpha: Double = 0.7): DataFrame = {
    val s = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col(sizeCol)).as("n_units"))
      .localCheckpoint(eager = true)
    val tot = s.agg(sum(col("n_units")).as("t_units"))
    val withShare = s.crossJoin(broadcast(tot))
      .withColumn("share", col("n_units").cast("double") / col("t_units"))
      .withColumn("pa", pow(col("share"), alpha))
    val z = withShare.agg(
      sum(col("pa").cast("decimal(27,12)")).cast("double").as("z"))
    withShare.crossJoin(broadcast(z))
      .withColumn("weight", col("pa") / col("z"))
      .select(col("source"), col("n_docs"), col("n_units"),
        round(col("share"), 6).as("share"),
        round(col("weight"), 6).as("weight"),
        round(col("weight") * col("t_units") / col("n_units"), 6).as("epochs"))
  }
}
