package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recommendation-list evaluation metrics — the natural extension of the
  * reference library's metric family (coverage/novelty/personalization measure
  * the catalog and diversity side; these measure ACCURACY against held-out
  * interactions). All set-based: inputs are (user, item) interaction frames,
  * recommendation order derived deterministically where rank matters.
  *
  * Scale shape: distinct → user-keyed aggregates and joins only; no windows
  * over global order; the corpus roll-up is a 1-row aggregate. Reciprocal
  * ranks sum through DECIMAL accumulators (order-independent).
  */
object RankingMetrics {

  /** Per-user precision/recall of the recommended set vs the actuals set.
    * Output: (user, n_recs, n_actual, n_hit, precision, recall) — one row per
    * user present in EITHER side (absent side counts 0; precision/recall null
    * when the denominator is 0, matching SQL semantics).
    */
  def precisionRecall(recs: DataFrame, actuals: DataFrame,
                      userCol: String, itemCol: String): DataFrame = {
    val r = recs.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val nr = r.groupBy(col("user")).agg(count(lit(1)).as("n_recs"))
    val na = a.groupBy(col("user")).agg(count(lit(1)).as("n_actual"))
    val hits = r.join(a, Seq("user", "item"))
      .groupBy(col("user")).agg(count(lit(1)).as("n_hit"))
    nr.join(na, Seq("user"), "full_outer")
      .join(hits, Seq("user"), "left")
      .select(col("user"),
        coalesce(col("n_recs"), lit(0L)).as("n_recs"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("precision",
        round(col("n_hit").cast("double") / expr("nullif(n_recs, 0)"), 6))
      .withColumn("recall",
        round(col("n_hit").cast("double") / expr("nullif(n_actual, 0)"), 6))
  }

  /** NDCG@k with binary relevance: each user's recommendations ranked by
    * (frequency desc, item), gain `1/log2(1+rank)` for ranks ≤ k that hit the
    * actuals; ideal DCG assumes the first `min(k, n_actual)` slots all hit.
    * Output per user WITH actuals: (user, n_actual, dcg, idcg, ndcg).
    *
    * Portability: `1/log2(1+r)` is computed as `ln2 / ln(1+r)` with an
    * embedded ln2 literal (both engines parse the same double), terms sum as
    * DECIMAL(18,8) — the [[meanReciprocalRank]] discipline.
    */
  def ndcgAtK(recs: DataFrame, actuals: DataFrame,
              userCol: String, itemCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ln2 = 0.6931471805599453
    val rc = recs.select(col(userCol).as("user"), col(itemCol).as("item"))
      .groupBy(col("user"), col("item")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user")).orderBy(col("n").desc, col("item"))
    val ranked = rc.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val dcg = ranked.join(a, Seq("user", "item"))
      .select(col("user"),
        (lit(ln2) / log(col("rnk") + 1)).cast("decimal(18,8)").as("g"))
      .groupBy(col("user")).agg(sum(col("g")).as("dcg"))
    val na = a.groupBy(col("user")).agg(count(lit(1)).as("n_actual"))
    val idcg = na
      .select(col("user"), col("n_actual"),
        explode(sequence(lit(1L), least(lit(k.toLong), col("n_actual")))).as("i"))
      .select(col("user"), col("n_actual"),
        (lit(ln2) / log(col("i") + 1)).cast("decimal(18,8)").as("g"))
      .groupBy(col("user"), col("n_actual")).agg(sum(col("g")).as("idcg"))
    idcg.join(dcg, Seq("user"), "left")
      .select(col("user"), col("n_actual"),
        round(coalesce(col("dcg"), lit(0)).cast("double"), 6).as("dcg"),
        round(col("idcg").cast("double"), 6).as("idcg"),
        round(coalesce(col("dcg"), lit(0)).cast("double") /
          col("idcg").cast("double"), 6).as("ndcg"))
  }

  /** MAP@k (mean-average-precision building block): per-user average precision
    * of the top-k recommendations, ranks assigned by (frequency desc, item) —
    * the same deterministic order as [[ndcgAtK]]. AP@k = Σ_{hit at rank r≤k}
    * precision@r / min(k, n_actual); users without actuals are excluded (AP is
    * undefined for them). Output: (user, n_actual, n_hits_at_k, ap) with ap
    * rounded half-up to 6 decimals.
    *
    * Scale shape: user-keyed windows and joins only — no global order. The
    * precision terms cum/rnk are exact rationals with denominators ≤ k, so AP
    * is computed ENTIRELY in integer arithmetic scaled by L = lcm(1..k): the
    * per-rank numerator is cum·(L/rnk) (exact — rnk divides L), and the 6-dp
    * half-up round is ⌊(2·10⁶·S + D) / 2D⌋ with D = L·min(k, n_actual). No
    * float enters before the final exact division, so the result is
    * bit-identical across engines and partition orders by construction.
    */
  def mapAtK(recs: DataFrame, actuals: DataFrame,
             userCol: String, itemCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rc = recs.select(col(userCol).as("user"), col(itemCol).as("item"))
      .groupBy(col("user"), col("item")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user")).orderBy(col("n").desc, col("item"))
    val ranked = rc.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val flagged = ranked.join(a.withColumn("hit", lit(1L)), Seq("user", "item"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0L)))
    val cumW = Window.partitionBy(col("user")).orderBy(col("rnk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = (1 to k).map(BigInt(_)).reduce((x, y) => x * y / x.gcd(y)).toLong
    val terms = flagged
      .withColumn("cum_hits", sum(col("hit")).over(cumW))
      .withColumn("term_num",
        when(col("hit") === 1, col("cum_hits") * expr(s"${L}L div rnk"))
          .otherwise(lit(0L)))
      .groupBy(col("user"))
      .agg(sum(col("hit")).as("n_hits_at_k"), sum(col("term_num")).as("ap_num"))
    val na = a.groupBy(col("user")).agg(count(lit(1)).as("n_actual"))
    na.join(terms, Seq("user"), "left")
      .withColumn("s", coalesce(col("ap_num"), lit(0L)))
      .withColumn("d", least(lit(k.toLong), col("n_actual")) * lit(L))
      .select(col("user"), col("n_actual"),
        coalesce(col("n_hits_at_k"), lit(0L)).as("n_hits_at_k"),
        (expr("(2000000 * s + d) div (2 * d)").cast("double") / lit(1e6)).as("ap"))
  }

  /** Corpus hit-rate@k and average-reciprocal-hit-rank: share of users whose
    * top-k (frequency-desc-ranked) recommendations contain ≥1 actual, and the
    * mean of 1/first-hit-rank (0 when no hit within k) over every user WITH
    * recommendations. Output: 1 row (k, n_users, n_users_hit, hit_rate, arhr).
    */
  def hitRateAtK(recs: DataFrame, actuals: DataFrame,
                 userCol: String, itemCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rc = recs.select(col(userCol).as("user"), col(itemCol).as("item"))
      .groupBy(col("user"), col("item")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user")).orderBy(col("n").desc, col("item"))
    val ranked = rc.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val firstHit = ranked.join(a, Seq("user", "item"))
      .groupBy(col("user")).agg(min(col("rnk")).as("first_hit"))
    rc.select(col("user")).distinct()
      .join(firstHit, Seq("user"), "left")
      .agg(lit(k).as("k"), count(lit(1)).as("n_users"),
        count(col("first_hit")).as("n_users_hit"),
        round(count(col("first_hit")).cast("double") / count(lit(1)), 6)
          .as("hit_rate"),
        round(sum(coalesce((lit(1.0) / col("first_hit")).cast("decimal(18,8)"),
            lit(0).cast("decimal(18,8)")))
          .cast("double") / count(lit(1)), 6).as("arhr"))
  }

  /** Serendipity: the share of each user's recommended items that are relevant
    * (appear in the user's actuals) AND unexpected (outside the global top-N
    * most-popular actual items, popularity = distinct-user count, ties broken
    * by item). A recommender that only re-serves blockbusters scores 0 even at
    * perfect precision. Output per user with recommendations:
    * (user, n_recs, n_hits, n_serendipitous, serendipity = n_ser/n_recs).
    *
    * Scale shape: the popular set is N rows — computed with
    * TakeOrderedAndProject and broadcast into the anti-join; everything else is
    * user-keyed distinct + join aggregation.
    */
  def serendipity(recs: DataFrame, actuals: DataFrame,
                  userCol: String, itemCol: String, topN: Int = 100): DataFrame = {
    val r = recs.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val popular = a.groupBy(col("item"))
      .agg(countDistinct(col("user")).as("n_users"))
      .orderBy(col("n_users").desc, col("item"))
      .limit(topN)
      .select(col("item"))
    val hits = r.join(a, Seq("user", "item"))
    val ser = hits.join(broadcast(popular), Seq("item"), "left_anti")
      .groupBy(col("user")).agg(count(lit(1)).as("n_serendipitous"))
    val nh = hits.groupBy(col("user")).agg(count(lit(1)).as("n_hits"))
    r.groupBy(col("user")).agg(count(lit(1)).as("n_recs"))
      .join(nh, Seq("user"), "left")
      .join(ser, Seq("user"), "left")
      .select(col("user"), col("n_recs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_serendipitous"), lit(0L)).as("n_serendipitous"))
      .withColumn("serendipity",
        round(col("n_serendipitous").cast("double") / col("n_recs"), 6))
  }

  /** Calibration overlap: how well each user's recommendation mix matches
    * their historical taste profile over a categorical feature (genre/brand).
    * With p = the user's history share per feature and q = the rec share,
    * overlap = Σ_f min(p_f, q_f) ∈ [0,1] (1 = perfectly calibrated). The
    * min-overlap form (1 − total-variation distance) avoids KL's log-of-zero
    * on features present in one side only — no smoothing constant to pick, and
    * exactly reproducible in SQL. Only users present in BOTH frames are scored.
    * Output: (user, n_feat_hist, n_feat_rec, overlap).
    */
  def calibrationOverlap(history: DataFrame, recs: DataFrame,
                         userCol: String, featureCol: String): DataFrame = {
    def counts(df: DataFrame, alias: String): (DataFrame, DataFrame) = {
      val c = df.select(col(userCol).as("user"), col(featureCol).as("feat"))
        .groupBy(col("user"), col("feat")).agg(count(lit(1)).as(s"n_$alias"))
      val t = c.groupBy(col("user")).agg(sum(col(s"n_$alias")).as(s"tot_$alias"),
        count(lit(1)).as(s"n_feat_$alias"))
      (c, t)
    }
    // overlap = Σ_feat min(nh/th, nr/tr) = Σ_feat min(nh·tr, nr·th) / (th·tr):
    // ALL-INTEGER numerator (one exact division at the end) — casting the
    // per-feature double shares to DECIMAL hits engine-dependent
    // double→decimal rounding at scale (caught by the sf0.1 oracle tier:
    // one user in 12.5k flipped its 6th decimal). Features on one side only
    // contribute min(p, 0) = 0, so the share sum needs only the INNER
    // feature join; users present in both sides but sharing no feature get
    // overlap 0 via the left join.
    val (hc, ht) = counts(history, "hist")
    val (rc, rt) = counts(recs, "rec")
    val users = ht.join(rt, Seq("user"))
    val num = hc.join(rc, Seq("user", "feat"))
      .join(users.select(col("user"), col("tot_hist"), col("tot_rec")), Seq("user"))
      .groupBy(col("user"))
      .agg(sum(least(col("n_hist") * col("tot_rec"),
        col("n_rec") * col("tot_hist"))).as("ov_num"))
    users.join(num, Seq("user"), "left")
      .select(col("user"), col("n_feat_hist"), col("n_feat_rec"),
        round(coalesce(col("ov_num"), lit(0L)).cast("double") /
          (col("tot_hist") * col("tot_rec")), 6).as("overlap"))
  }

  /** Mean reciprocal rank: each user's recommendations are ranked by
    * (frequency desc, item) — a deterministic, popularity-within-user order —
    * and the user contributes 1/rank of their first actual hit (0 if none).
    * Output: 1 row (n_users, n_users_hit, mrr), averaging over every user
    * WITH recommendations.
    */
  def meanReciprocalRank(recs: DataFrame, actuals: DataFrame,
                         userCol: String, itemCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rc = recs.select(col(userCol).as("user"), col(itemCol).as("item"))
      .groupBy(col("user"), col("item")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user")).orderBy(col("n").desc, col("item"))
    val ranked = rc.withColumn("rnk", row_number().over(w).cast("long"))
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val firstHit = ranked.join(a, Seq("user", "item"))
      .groupBy(col("user")).agg(min(col("rnk")).as("first_hit"))
    val users = rc.select(col("user")).distinct()
    users.join(firstHit, Seq("user"), "left")
      .agg(count(lit(1)).as("n_users"),
        count(col("first_hit")).as("n_users_hit"),
        round(sum(coalesce((lit(1.0) / col("first_hit")).cast("decimal(18,8)"),
            lit(0).cast("decimal(18,8)")))
          .cast("double") / count(lit(1)), 6).as("mrr"))
  }

  /** Expected reciprocal rank @k (Chapelle et al., CIKM 2009) with binary
    * relevance: a relevant item at rank r stops the cascade with probability
    * R = 1/2, so ERR = Σ_{hit at rank r} (1/r) · (1/2) · (1/2)^{hits before r}.
    * Unlike MRR this discounts hits that sit BELOW earlier hits — a list whose
    * relevant items are all buried under other relevant items scores lower
    * than one spreading them to the top. Ranks come from the same
    * deterministic (frequency desc, item) order as [[ndcgAtK]]/[[mapAtK]].
    *
    * Every user with recommendations gets a row (err = 0 when no hit in the
    * top k). The cascade factor (1/2)^{h+1} is an exact power of two and each
    * term is cast to DECIMAL(18,8) before the sum, so the aggregate is
    * addition-order-independent — bit-identical across engines and partition
    * orders. Scale shape: user-keyed windows + an equi-join; no global order.
    * Output: (user, n_hits_at_k, err) with err rounded half-up to 6 decimals.
    */
  def errAtK(recs: DataFrame, actuals: DataFrame,
             userCol: String, itemCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rc = recs.select(col(userCol).as("user"), col(itemCol).as("item"))
      .groupBy(col("user"), col("item")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user")).orderBy(col("n").desc, col("item"))
    val ranked = rc.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
    val a = actuals.select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val flagged = ranked.join(a.withColumn("hit", lit(1L)), Seq("user", "item"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0L)))
    val before = Window.partitionBy(col("user")).orderBy(col("rnk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    flagged
      .withColumn("hb", coalesce(sum(col("hit")).over(before), lit(0L)))
      .withColumn("term",
        when(col("hit") === 1,
            (pow(lit(0.5), col("hb") + 1) / col("rnk")).cast("decimal(18,8)"))
          .otherwise(lit(0).cast("decimal(18,8)")))
      .groupBy(col("user"))
      .agg(sum(col("hit")).as("n_hits_at_k"),
        round(sum(col("term")).cast("double"), 6).as("err"))
  }
}
