package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Voting-theoretic RANK FUSION — Borda (1781) and Copeland (1951)
  * aggregation of k rankers over one item set: the classical complements
  * of `q_hybrid_rrf`'s reciprocal-rank fusion. Borda rewards average
  * position (score = Σ_rankers (n − rank)); Copeland rewards pairwise
  * majorities (wins − losses over all head-to-head item pairs), which is
  * Condorcet-consistent — an item that beats every other item in a
  * majority of rankers always tops Copeland, a guarantee neither Borda
  * nor RRF gives. Ensemble ranking of retrieval backends, judge panels,
  * metric leaderboards.
  *
  * Input: a LONG-format ranking table (item, ranker, rank) where each
  * ranker assigns each item exactly one 1-based rank. All-integer
  * scores; ties in the final ordering break on item id.
  *
  * Scale shape: the rankings table is post-aggregation metadata (items ×
  * rankers); the Copeland pairwise join is items²·k rows of that
  * metadata, never corpus data. Both fuse in one plan: a per-item Borda
  * aggregate and a pair-majority aggregate joined back.
  */
object RankFusion {

  /** Fuse long-format rankings. Output per item, ordered by
    * (copeland desc, borda desc, item): (item, n_rankers, borda,
    * copeland_wins, copeland_losses, copeland).
    */
  def bordaCopeland(rankings: DataFrame, itemCol: String, rankerCol: String,
                    rankCol: String): DataFrame = {
    val r = rankings.select(col(itemCol).cast("string").as("item"),
      col(rankerCol).cast("string").as("ranker"),
      col(rankCol).cast("long").as("rank"))
    val nItems = r.select(col("item")).distinct()
      .agg(count(lit(1)).as("n_items"))
    val borda = r.crossJoin(broadcast(nItems))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n_rankers"),
        sum(col("n_items") - col("rank")).as("borda"))
    // pairwise majorities: i beats j when rank_i < rank_j for MORE rankers
    // than the reverse (strict majority; pair ties score neither side)
    val pairs = r.select(col("item").as("i"), col("ranker"),
        col("rank").as("ri"))
      .join(r.select(col("item").as("j"), col("ranker").as("ranker2"),
        col("rank").as("rj")),
        col("ranker") === col("ranker2") && col("i") < col("j"))
      .groupBy(col("i"), col("j"))
      .agg(sum(when(col("ri") < col("rj"), 1L).otherwise(0L)).as("i_wins"),
        sum(when(col("rj") < col("ri"), 1L).otherwise(0L)).as("j_wins"))
    val duels = pairs.select(col("i").as("item"),
        when(col("i_wins") > col("j_wins"), 1L)
          .when(col("j_wins") > col("i_wins"), -1L).otherwise(0L).as("pt"))
      .unionByName(pairs.select(col("j").as("item"),
        when(col("j_wins") > col("i_wins"), 1L)
          .when(col("i_wins") > col("j_wins"), -1L).otherwise(0L).as("pt")))
    val copeland = duels.groupBy(col("item"))
      .agg(sum(when(col("pt") === 1L, 1L).otherwise(0L)).as("copeland_wins"),
        sum(when(col("pt") === -1L, 1L).otherwise(0L))
          .as("copeland_losses"))
    borda.join(copeland, Seq("item"), "left")
      .select(col("item"), col("n_rankers"), col("borda"),
        coalesce(col("copeland_wins"), lit(0L)).as("copeland_wins"),
        coalesce(col("copeland_losses"), lit(0L)).as("copeland_losses"),
        (coalesce(col("copeland_wins"), lit(0L)) -
          coalesce(col("copeland_losses"), lit(0L))).as("copeland"))
      .orderBy(col("copeland").desc, col("borda").desc, col("item"))
  }
}
