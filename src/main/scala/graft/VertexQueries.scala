package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 batch 1: unigram-LM (SentencePiece-style) tokenizer training
  * and encoding — the second of the two tokenizer algorithms real
  * pipelines train (Kudo 2018), next to the BPE family. Both queries are
  * rows-only by contract, like the BPE trio: the EM/prune recurrence is
  * not SQL-expressible, and the gate is UnigramLmSpec's independent
  * single-threaded reference differential.
  */
object VertexQueries {

  // --------------------------------------------------------------------------
  // Unigram-LM tokenizer
  // --------------------------------------------------------------------------

  /** Train a unigram-LM vocabulary on the document corpus
    * ([[graft.ext.UnigramLm.train]]): pieces up to 5 chars, 150-piece
    * multi-char seed pruned to 60 under hard-EM. Output one row per kept
    * piece: (rank, piece, count, logp) — the vocabulary table an encode
    * service ships. Rows-only check (merge recurrence, like q_bpe_train).
    */
  def qUnigramTrain(spark: SparkSession, dir: String): DataFrame =
    graft.ext.UnigramLm.trainDF(Tables.documents(spark, dir), "text",
      graft.ext.UnigramLm.Config(maxPieceLen = 5, seedMulti = 150,
        targetMulti = 60, emIters = 2, minFreq = 2))

  /** Train-then-encode composition: learn the vocabulary, Viterbi-encode
    * the corpus with it, report per-doc unigram sequence lengths
    * ([[graft.ext.UnigramLm.encode]]; rows-only check, like q_bpe_encode).
    */
  def qUnigramEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cfg = graft.ext.UnigramLm.Config(maxPieceLen = 5, seedMulti = 150,
      targetMulti = 60, emIters = 2, minFreq = 2)
    val pieces = graft.ext.UnigramLm.train(docs, "text", cfg)
    graft.ext.UnigramLm.encode(docs, "doc_id", "text", pieces,
        maxPieceLen = cfg.maxPieceLen)
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unigram_train" -> (qUnigramTrain _),
    "q_unigram_encode" -> (qUnigramEncode _))

  val oracleSql: Map[String, String] = Map.empty
}
