package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage: blocked fuzzy string matching and entity clustering.
  *
  * The classic entity-resolution pipeline (Fellegi–Sunter style blocking +
  * edit-distance verification + transitive closure), expressed as Spark
  * relational plans. All-pairs edit distance is O(n²·len²) and impossible at
  * corpus scale; the standard answer is BLOCKING: a cheap deterministic key
  * (here: the record's last name token) partitions candidates so the
  * quadratic term is per-block, plus a length band that rejects pairs whose
  * length gap already exceeds the distance budget — |len(a) − len(b)| is a
  * lower bound on Levenshtein distance, so the band is lossless. The
  * verification step uses Spark's codegen'd `levenshtein(l, r, threshold)`
  * which abandons the DP early once the threshold is exceeded (O(len·k)
  * banded DP instead of O(len²)).
  *
  * 100 TB shape: block key + length band prune candidates scan-side before
  * any shuffle; the only shuffle is the equi-join on the block key. Hot
  * blocks (a very common last token) bound the quadratic term exactly like
  * hot shingles in [[Dedup.jaccardPairs]] — the same `stopBlockMaxDf` escape
  * applies: drop blocks with more than N members from candidate generation
  * (they carry no discriminating signal, by the df-idf argument).
  */
object Linkage {

  /** Candidate pairs of similar names: block on the last whitespace token,
    * band on length, verify with Levenshtein ≤ `maxDist`. Pairs are oriented
    * `id_a < id_b`. Output: (id_a, id_b, name_a, name_b, dist).
    *
    * @param stopBlockMaxDf drop blocks with more members than this from
    *   candidate generation (None = keep all; the exact-verification analog
    *   of [[Dedup]]'s stop-shingle cap).
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                 maxDist: Int = 2, lengthBand: Int = 2,
                 stopBlockMaxDf: Option[Int] = None): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"))
      .withColumn("blk", element_at(split(col("name"), " "), -1))
    val blocked = stopBlockMaxDf match {
      case Some(cap) =>
        val keep = base.groupBy(col("blk")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("blk"))
        base.join(broadcast(keep), Seq("blk"))
      case None => base
    }
    val a = blocked.select(col("blk"), col("id").as("id_a"),
      col("name").as("name_a"), length(col("name")).as("len_a"))
    val b = blocked.select(col("blk"), col("id").as("id_b"),
      col("name").as("name_b"), length(col("name")).as("len_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= lengthBand)
      // threshold form returns -1 past maxDist — the banded-DP early exit
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist").between(0, maxDist))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"), col("dist"))
  }

  /** Multi-pass blocking: candidates from the FIRST-token block unioned with
    * the last-token block, deduplicated before the (expensive) verification
    * DP runs once per distinct candidate. Single-key blocking misses any true
    * match whose edit touches the block key ("john smith" / "john smyth"
    * share no last token); each extra pass is the same bounded equi-join, so
    * recall insurance costs one more shuffle of the (id, name) projection —
    * the standard production trade (add phonetic/k-gram passes the same way).
    */
  def fuzzyPairsMultiBlock(df: DataFrame, idCol: String, nameCol: String,
                           maxDist: Int = 2, lengthBand: Int = 2): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"))
      .withColumn("blks", array_distinct(array(
        element_at(split(col("name"), " "), 1),
        element_at(split(col("name"), " "), -1))))
      .select(col("id"), col("name"), explode(col("blks")).as("blk"),
        length(col("name")).as("len"))
    val a = base.select(col("blk"), col("id").as("id_a"),
      col("name").as("name_a"), col("len").as("len_a"))
    val b = base.select(col("blk"), col("id").as("id_b"),
      col("name").as("name_b"), col("len").as("len_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= lengthBand)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      .distinct() // a pair may surface from both passes; verify once
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist").between(0, maxDist))
  }

  /** Entity clusters: transitive closure over [[fuzzyPairs]] via
    * [[Dedup.dupClusters]] (pointer-jumping connected components). Output:
    * (id, cluster_id = min id reachable).
    */
  def entityClusters(df: DataFrame, idCol: String, nameCol: String,
                     maxDist: Int = 2, lengthBand: Int = 2): DataFrame =
    Dedup.dupClusters(fuzzyPairs(df, idCol, nameCol, maxDist, lengthBand)
      .select(col("id_a"), col("id_b")))

  /** FELLEGI-SUNTER probabilistic linkage weights (Fellegi & Sunter,
    * JASA 1969 — the model Splink/Dedupe productionize): per comparison
    * field, estimate m = P(agree | match) and u = P(agree | non-match)
    * from labeled candidate pairs, and derive the log2 agreement /
    * disagreement weights a scoring pass sums. Laplace-smoothed
    * ((cnt+1)/(tot+2)) so a field that never disagrees among matches
    * still yields finite weights.
    *
    * Exactness: m/u and each weight are ONE fixed double formula over
    * exact integer counts — w_agree = log2((m_cnt+1)·(u_tot+2) /
    * ((u_cnt+1)·(m_tot+2))) with integer products < 2⁵³ — so both
    * engines agree bit-for-bit.
    *
    * Input: candidate pairs with a boolean truth column and k boolean
    * agreement columns. Output per field, ordered: (field, m_cnt, m_tot,
    * u_cnt, u_tot, m, u, w_agree, w_disagree).
    *
    * Scale shape: one conditional aggregate over the pair table per
    * call (fields unpivot map-side via one explode) — the pair table
    * itself comes from blocking, never the corpus cross product.
    */
  def fellegiSunterWeights(pairs: DataFrame, truthCol: String,
                           fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    val long = pairs.select(col(truthCol).as("__t"),
      explode(array(fields.map(f =>
        struct(lit(f).as("field"), col(f).as("agree"))): _*)).as("e"))
      .select(col("__t"), col("e.field").as("field"),
        col("e.agree").as("agree"))
    long.groupBy(col("field"))
      .agg(sum(when(col("__t") && col("agree"), 1L).otherwise(0L))
          .as("m_cnt"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("m_tot"),
        sum(when(!col("__t") && col("agree"), 1L).otherwise(0L))
          .as("u_cnt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("u_tot"))
      .select(col("field"), col("m_cnt"), col("m_tot"), col("u_cnt"),
        col("u_tot"),
        round(expr("CAST(m_cnt + 1 AS DOUBLE) / CAST(m_tot + 2 AS DOUBLE)"),
          6).as("m"),
        round(expr("CAST(u_cnt + 1 AS DOUBLE) / CAST(u_tot + 2 AS DOUBLE)"),
          6).as("u"),
        round(expr("log2(CAST((m_cnt + 1) * (u_tot + 2) AS DOUBLE) /" +
          " CAST((u_cnt + 1) * (m_tot + 2) AS DOUBLE))"), 6).as("w_agree"),
        round(expr("log2(CAST((m_tot - m_cnt + 1) * (u_tot + 2) AS DOUBLE)" +
          " / CAST((u_tot - u_cnt + 1) * (m_tot + 2) AS DOUBLE))"), 6)
          .as("w_disagree"))
      .orderBy(col("field"))
  }

  /** Score every candidate pair with the [[fellegiSunterWeights]] table:
    * score = Σ_fields (agree ? w_agree : w_disagree), summed as ONE fixed
    * expression in `fields` order (never a float SUM aggregate, whose
    * combine order is partition-dependent) against the 1-row pivoted
    * weight table broadcast into the scan. Output columns: the pair's
    * id columns + the truth column + `score` (log2 match odds shift).
    */
  def fellegiSunterScore(pairs: DataFrame, idCols: Seq[String],
                         truthCol: String, fields: Seq[String]): DataFrame = {
    val w = fellegiSunterWeights(pairs, truthCol, fields)
    // flatten the k-row weight table to ONE row of scalar columns
    val aggs = fields.flatMap(f => Seq(
      max(when(col("field") === f, col("w_agree"))).as(s"__wa_$f"),
      max(when(col("field") === f, col("w_disagree"))).as(s"__wd_$f")))
    val oneRow = w.agg(aggs.head, aggs.tail: _*)
    val total = fields.map { f =>
      when(col(f), col(s"__wa_$f")).otherwise(col(s"__wd_$f"))
    }.reduce(_ + _)
    pairs.crossJoin(broadcast(oneRow))
      .select(idCols.map(col) :+ col(truthCol) :+
        round(total, 6).as("score"): _*)
  }
}
