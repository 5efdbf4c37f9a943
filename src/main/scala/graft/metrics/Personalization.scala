package graft.metrics

import org.apache.spark.mllib.linalg.distributed.{CoordinateMatrix, MatrixEntry}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Personalization — 1 − mean pairwise cosine similarity between users' item-count
  * vectors (how dissimilar users' recommendation lists are from each other).
  *
  * Reference: `personalization` (/root/reference/recmetrics_pyspark/recmetrics_pyspark.py:300-412).
  * The reference pivots to a user×item count matrix (`pivot().sum(lit(1))`, :337-342 —
  * note: counts, NOT clamped to binary; duplicate (user,item) rows raise the entry,
  * SURVEY.md §2.4.4) and computes the user-user cosine Gram three equivalent ways; the
  * default v2 uses DIMSUM `columnSimilarities()` (:403-409). Result
  * `= 1 − 2·Σ_upper / (n(n−1))` (:408-409); golden value `0.666666666666667` for the
  * 3-user doctest (:320-333).
  *
  * Our primary implementation never pivots (pivot explodes columns at scale —
  * SURVEY.md §7.4): the pairwise dot products come from a self-join on the item key in
  * long format, so the plan stays fully inside Catalyst, shuffles scale with the number
  * of item co-occurrences (not users²), and the result is SQL-oracle-checkable. The
  * MLlib DIMSUM path is kept as the differential-test partner and the
  * sampling-threshold escape hatch for extreme scale.
  */
object Personalization {

  /** Pairwise user-user cosine similarities over shared items, long format.
    * Output: (u1, u2, sim) with u1 < u2 — only pairs with at least one shared item
    * (absent pairs have cosine 0).
    *
    * `maxItemUsers`: optional hot-item cap. The self-join's shuffle grows with
    * Σ_item n_users(item)² — one item bought by every user makes the metric
    * quadratic in users. Items above the cap are dropped from the count vectors
    * BEFORE the join (norms and dots stay mutually consistent: cosine is computed
    * exactly in the reduced item space). Same rationale as DIMSUM's sampling of
    * heavy columns: near-universal items carry almost no signal about how users
    * differ, so the approximation error is small (quantified in
    * PersonalizationSpec) while the quadratic term is bounded by the cap.
    */
  def pairwiseCosine(df: DataFrame, colUser: String, colItem: String,
                     maxItemUsers: Option[Long] = None): DataFrame = {
    // no cache: c's exchange is shared by both join sides + norms via ReuseExchange
    val c0 = df.groupBy(col(colUser), col(colItem))
      .agg(count(lit(1)).cast("double").as("v"))
    val c = maxItemUsers.fold(c0) { cap =>
      // c0 has one row per (user, item) → per-item row count == user count
      val hot = c0.groupBy(col(colItem)).agg(count(lit(1)).as("n_users_item"))
        .filter(col("n_users_item") > cap).select(col(colItem))
      c0.join(broadcast(hot), Seq(colItem), "left_anti")
    }
    val norms = c.groupBy(col(colUser))
      .agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
    val a = c.select(col(colUser).as("u1"), col(colItem).as("i"), col("v").as("va"))
    val b = c.select(col(colUser).as("u2"), col(colItem).as("i"), col("v").as("vb"))
    a.join(b, a("i") === b("i") && a("u1") < b("u2"))
      .groupBy(col("u1"), col("u2"))
      .agg(sum(col("va") * col("vb")).as("dot"))
      .join(norms.select(col(colUser).as("u1"), col("nrm").as("n1")), Seq("u1"))
      .join(norms.select(col(colUser).as("u2"), col("nrm").as("n2")), Seq("u2"))
      .select(col("u1"), col("u2"), (col("dot") / (col("n1") * col("n2"))).as("sim"))
  }

  /** Scalar personalization via the Catalyst-native self-join path. Two actions
    * consume the (user,item) counts, so that compact aggregate is cached — not the
    * raw input. `maxItemUsers` as in [[pairwiseCosine]]; `n` (the pair-count
    * denominator) always counts ALL users, capped or not.
    */
  def personalization(df: DataFrame, colUser: String, colItem: String,
                      maxItemUsers: Option[Long] = None): Double = {
    val c0 = df.groupBy(col(colUser), col(colItem))
      .agg(count(lit(1)).cast("double").as("v")).cache()
    try {
      val n = c0.select(col(colUser)).distinct().count()
      if (n < 2) return 0.0
      val c = maxItemUsers.fold(c0) { cap =>
        val hot = c0.groupBy(col(colItem)).agg(count(lit(1)).as("n_users_item"))
          .filter(col("n_users_item") > cap).select(col(colItem))
        // anti-join moves the join key to column 0; restore (user, item, v) order
        // for the positional access in pairwiseCosineFromCounts
        c0.join(broadcast(hot), Seq(colItem), "left_anti")
          .select(col(colUser), col(colItem), col("v"))
      }
      val sumSim = pairwiseCosineFromCounts(c, colUser)
        .agg(coalesce(sum(col("sim")), lit(0.0))).first().getDouble(0)
      1.0 - 2.0 * sumSim / (n.toDouble * (n - 1))
    } finally { c0.unpersist(); () }
  }

  /** Pairwise cosine from a pre-aggregated (user, item, v) counts table. */
  private def pairwiseCosineFromCounts(c: DataFrame, colUser: String): DataFrame = {
    val norms = c.groupBy(col(colUser))
      .agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
    val cols = c.columns
    val a = c.select(col(cols(0)).as("u1"), col(cols(1)).as("i"), col("v").as("va"))
    val b = c.select(col(cols(0)).as("u2"), col(cols(1)).as("i"), col("v").as("vb"))
    a.join(b, a("i") === b("i") && a("u1") < b("u2"))
      .groupBy(col("u1"), col("u2"))
      .agg(sum(col("va") * col("vb")).as("dot"))
      .join(norms.select(col(colUser).as("u1"), col("nrm").as("n1")), Seq("u1"))
      .join(norms.select(col(colUser).as("u2"), col("nrm").as("n2")), Seq("u2"))
      .select(col("u1"), col("u2"), (col("dot") / (col("n1") * col("n2"))).as("sim"))
  }

  /** One-row DataFrame form (n_users, personalization) for the oracle. */
  def personalizationDF(df: DataFrame, colUser: String, colItem: String): DataFrame = {
    val pairs = pairwiseCosine(df, colUser, colItem)
      .agg(coalesce(sum(col("sim")), lit(0.0)).as("sum_sim"))
    val n = df.agg(countDistinct(col(colUser)).as("n_users"))
    n.crossJoin(pairs).select(
      col("n_users"),
      round(lit(1.0) - lit(2.0) * col("sum_sim") / (col("n_users") * (col("n_users") - lit(1))), 6)
        .as("personalization"))
  }

  /** Closed-form mean of the off-diagonal of a symmetric similarity matrix with unit
    * diagonal: `(Σ_all − n) / (n(n−1))` — the reference's `get_symmetrical_matrix_mean`
    * (:288-298). Its sibling `get_upper_triangle_mean` (:184-188) additionally embeds
    * the `1 −` flip (SURVEY.md §2.4.6); both assume cosine(self)=1, i.e. no zero rows.
    */
  def symmetricalMatrixMean(sumAll: Double, n: Long): Double =
    (sumAll - n) / (n.toDouble * (n - 1))

  def upperTriangleMean(sumAll: Double, n: Long): Double =
    1.0 - symmetricalMatrixMean(sumAll, n)

  /** BlockMatrix Gram path mirroring the reference's v0 `cosine_similarity_matrix`
    * (:197-246): L2-normalize each user's count vector, multiply the matrix by its
    * transpose, and reduce the Gram entries distributed (the reference's
    * `toLocalMatrix` / all-ones-vector tricks at :249-298 are replaced by an
    * `entries`-RDD sum — no driver materialization). Differential partner of
    * [[personalization]] / [[personalizationDimsum]].
    */
  def personalizationBlockMatrix(df: DataFrame, colUser: String, colItem: String,
                                 blockSize: Int = 1024): Double = {
    val counts = df.groupBy(col(colUser), col(colItem))
      .agg(count(lit(1)).cast("double").as("v")).cache()
    try {
      // dense matrix indices are derived DISTRIBUTED (zipWithIndex + RDD join on
      // the natural key) — no collectAsMap: a driver-side O(#users + #items) map
      // is exactly the scale ceiling this v0 partner exists to avoid
      val userIdx = counts.select(col(colUser)).distinct().rdd
        .map(_.get(0)).zipWithIndex()
      val n = userIdx.count()
      if (n < 2) return 0.0
      val itemIdx = counts.select(col(colItem)).distinct().rdd
        .map(_.get(0)).zipWithIndex()
      val nItems = itemIdx.count()
      val normsRdd = counts.groupBy(col(colUser))
        .agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
        .rdd.map(r => (r.get(0), r.getDouble(1)))
      val entries = counts.rdd
        .map(r => (r.get(0), (r.get(1), r.getDouble(2))))
        .join(userIdx.join(normsRdd))
        .map { case (_, ((item, v), (uid, nrm))) => (item, (uid, v / nrm)) }
        .join(itemIdx)
        .map { case (_, ((uid, x), iid)) => MatrixEntry(uid, iid, x) }
      val m = new CoordinateMatrix(entries, n, nItems)
        .toBlockMatrix(blockSize, blockSize)
      val gram = m.multiply(m.transpose)
      val sumAll = gram.toCoordinateMatrix().entries.map(_.value).sum()
      upperTriangleMean(sumAll, n)
    } finally { counts.unpersist(); () }
  }

  /** MLlib DIMSUM path, mirroring the reference's v2 (:388-409): items as matrix rows,
    * users as columns, `columnSimilarities()` (threshold 0 → exact all pairs). Used in
    * differential tests against [[personalization]]; at extreme scale a positive
    * threshold trades exactness for sampling (DIMSUM, Zadeh & Carlsson 2013).
    */
  def personalizationDimsum(df: DataFrame, colUser: String, colItem: String,
                            threshold: Double = 0.0): Double = {
    val counts = df.groupBy(col(colUser), col(colItem))
      .agg(count(lit(1)).cast("double").as("v")).cache()
    try {
      // indices derived distributed, as in [[personalizationBlockMatrix]]
      val userIdx = counts.select(col(colUser)).distinct().rdd
        .map(_.get(0)).zipWithIndex()
      val n = userIdx.count()
      if (n < 2) return 0.0
      val itemIdx = counts.select(col(colItem)).distinct().rdd
        .map(_.get(0)).zipWithIndex()
      val nItems = itemIdx.count()
      val entries = counts.rdd
        .map(r => (r.get(0), (r.get(1), r.getDouble(2))))
        .join(userIdx)
        .map { case (_, ((item, v), uid)) => (item, (uid, v)) }
        .join(itemIdx)
        .map { case (_, ((uid, v), iid)) => MatrixEntry(iid, uid, v) }
      val mat = new CoordinateMatrix(entries, nItems, n).toRowMatrix()
      val sumSim = mat.columnSimilarities(threshold).entries.map(_.value).sum()
      1.0 - 2.0 * sumSim / (n.toDouble * (n - 1))
    } finally { counts.unpersist(); () }
  }
}
