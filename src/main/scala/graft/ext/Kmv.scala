package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch with SET-OPERATION estimates
  * (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07): keep the k
  * smallest hash values of a set; the k-th smallest normalized hash u_k
  * estimates the distinct count as (k−1)/u_k, and — the capability
  * [[Sketches.hllIntersectAudit]]'s HLL registers fundamentally lack —
  * the union sketch is a uniform sample of the union's DISTINCT elements,
  * so tagging each sampled element with which input sets contain it gives
  * unbiased estimates of |A∩B|, |A\B| and |B\A| (HLL can only
  * inclusion-exclude the intersection and can never subtract).
  *
  * Exactness/portability: hashes are the repo's standard 32-bit md5
  * prefix (exact longs; ties impossible on distinct keys since the hash
  * is a function of the key), sketches are TakeOrdered k-row tables, and
  * every estimate is one double formula over (integer count, u_k = h/2³²)
  * — the DuckDB oracle replays hash, selection and formula bit-for-bit.
  *
  * Scale shape: per side ONE distinct + TakeOrderedAndProject (per-
  * partition k-row heaps — k rows per partition to the driver-free
  * merge); everything after operates on ≤ 2k-row tables. The combined
  * estimator never touches the corpus again.
  */
object Kmv {

  /** One-row set-operation audit of two key sets. Output:
    * (k, est_a, est_b, est_union, est_intersect, est_only_a, est_only_b,
    * true_intersect, true_only_a, true_only_b). Requires both sets to
    * carry ≥ k distinct keys (the estimator's regime; a require-guard
    * raises otherwise — below k the sketch IS the set and no estimation
    * is needed).
    */
  def setOpsAudit(dfA: DataFrame, dfB: DataFrame, keyCol: String,
                  k: Int = 128): DataFrame = {
    require(k >= 16, s"k must be >= 16, got $k")
    val spark = dfA.sparkSession
    import spark.implicits._
    // a sketch IS ≤ k rows — pull it to the driver once (the bounded
    // centroid-collect pattern) so the three downstream consumers read a
    // local relation instead of re-running (or checkpointing) the corpus
    // TakeOrdered per use
    def sketch(df: DataFrame): DataFrame =
      df.select(col(keyCol).cast("string").as("key")).distinct()
        .select(col("key"),
          conv(substring(md5(col("key")), 1, 8), 16, 10).cast("long")
            .as("h"))
        .orderBy(col("h"), col("key")).limit(k)
        .as[(String, Long)].collect().toSeq.toDF("key", "h")
    val sa = sketch(dfA)
    val sb = sketch(dfB)
    // KMV(A ∪ B) = k smallest of KMV(A) ∪ KMV(B); tag each union-sample
    // element with which side(s) know it — membership in the ORIGINAL set
    // is decidable from the sketches alone for any h ≤ that side's u_k
    val union = sa.select(col("key"), col("h"))
      .union(sb.select(col("key"), col("h"))).distinct()
      .orderBy(col("h"), col("key")).limit(k)
    def kth(s: DataFrame): DataFrame =
      s.agg(max(col("h")).as("hk"), count(lit(1)).as("n"))
    val est = union
      .join(sa.select(col("key"), lit(1).as("__a")), Seq("key"), "left")
      .join(sb.select(col("key"), lit(1).as("__b")), Seq("key"), "left")
      .agg(max(col("h")).as("hu"), count(lit(1)).as("nu"),
        sum(when(col("__a") === 1 && col("__b") === 1, 1L).otherwise(0L))
          .as("c_both"),
        sum(when(col("__a") === 1 && col("__b").isNull, 1L).otherwise(0L))
          .as("c_only_a"),
        sum(when(col("__b") === 1 && col("__a").isNull, 1L).otherwise(0L))
          .as("c_only_b"))
    def dv(hCol: org.apache.spark.sql.Column,
           nCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (nCol.cast("double") - 1.0) /
        (hCol.cast("double") / lit(4294967296.0))
    val exact = {
      val a = dfA.select(col(keyCol).cast("string").as("key")).distinct()
      val b = dfB.select(col(keyCol).cast("string").as("key")).distinct()
      a.join(b, Seq("key"), "left_semi")
        .agg(count(lit(1)).as("t_intersect"))
        .crossJoin(a.join(b, Seq("key"), "left_anti")
          .agg(count(lit(1)).as("t_only_a")))
        .crossJoin(b.join(a, Seq("key"), "left_anti")
          .agg(count(lit(1)).as("t_only_b")))
    }
    kth(sa).select(col("hk").as("ha"), col("n").as("na"))
      .crossJoin(kth(sb).select(col("hk").as("hb"), col("n").as("nb")))
      .crossJoin(est).crossJoin(exact)
      .select(lit(k.toLong).as("k"),
        when(col("na") < k, raise_error(lit("kmv: |A| < k")))
          .otherwise(round(dv(col("ha"), col("na")), 6)).as("est_a"),
        when(col("nb") < k, raise_error(lit("kmv: |B| < k")))
          .otherwise(round(dv(col("hb"), col("nb")), 6)).as("est_b"),
        round(dv(col("hu"), col("nu")), 6).as("est_union"),
        round(col("c_both").cast("double") / col("nu") *
          dv(col("hu"), col("nu")), 6).as("est_intersect"),
        round(col("c_only_a").cast("double") / col("nu") *
          dv(col("hu"), col("nu")), 6).as("est_only_a"),
        round(col("c_only_b").cast("double") / col("nu") *
          dv(col("hu"), col("nu")), 6).as("est_only_b"),
        col("t_intersect").as("true_intersect"),
        col("t_only_a").as("true_only_a"),
        col("t_only_b").as("true_only_b"))
  }
}
