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
  // Image header metadata sweep
  // --------------------------------------------------------------------------

  /** Image metadata sweep with the REAL header-only PNG/JPEG parser
    * ([[graft.multimodal.ImageHeaderCodec]]): manufacture a genuine image
    * blob per document (format/dimensions/depth/channels derived from the
    * row — CRC-correct PNG IHDR or walkable JPEG marker stream), then
    * recover the metadata by parsing the binary header back. The oracle
    * recomputes every field from the source columns, so a green row proves
    * parse∘encode is the identity on the whole header, including the PNG
    * color-type → channel map and both closed-form byte sizes. The codec
    * spec additionally locks the parser against hand-laid fixtures
    * (fill bytes, restart markers, progressive SOF2, corrupted CRC).
    */
  def qMultimodalImage(spark: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    val params = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("png")).otherwise(lit("jpeg"))
          .as("fmt"),
        (lit(1) + col("doc_id") % 1021).cast("int").as("w"),
        (lit(1) + (col("doc_id") * 7) % 997).cast("int").as("h"),
        when(col("doc_id") % 4 === 0, lit(16)).otherwise(lit(8))
          .cast("int").as("bd"),
        // even ids: doc_id % 8 ∈ {0,2,4,6} IS a valid non-palette PNG
        // color type; odd ids: 1..3 JPEG components
        when(col("doc_id") % 2 === 0, (col("doc_id") % 8).cast("int"))
          .otherwise((lit(1) + col("doc_id") % 3).cast("int")).as("cc"),
        (octet_length(encode(col("text"), "UTF-8")) % 300).cast("int")
          .as("pb"))
    val img = Multimodal.synthImageMedia(params, "fmt", "w", "h", "bd", "cc",
      "pb")
    Multimodal.decodeImageMeta(img, "media")
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("bit_depth"), col("n_channels"), col("n_bytes"))
      .orderBy(col("doc_id"))
  }

  val multimodalImageSql: String =
    """WITH p AS (SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
      |    1 + doc_id % 1021 AS w,
      |    1 + (doc_id * 7) % 997 AS h,
      |    CASE WHEN doc_id % 4 = 0 THEN 16 ELSE 8 END AS bd,
      |    doc_id % 8 AS ct,
      |    1 + doc_id % 3 AS nc,
      |    octet_length(encode(text)) % 300 AS pb
      |  FROM documents)
      |SELECT doc_id, fmt AS format,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(CASE WHEN fmt = 'png' THEN bd ELSE 8 END AS BIGINT)
      |    AS bit_depth,
      |  CAST(CASE WHEN fmt = 'png' THEN
      |      CASE ct WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 4 THEN 2
      |        WHEN 6 THEN 4 END
      |    ELSE nc END AS BIGINT) AS n_channels,
      |  CAST(CASE WHEN fmt = 'png' THEN 57 + pb
      |    ELSE 44 + 5 * nc + pb END AS BIGINT) AS n_bytes
      |FROM p ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unigram_train" -> (qUnigramTrain _),
    "q_unigram_encode" -> (qUnigramEncode _),
    "q_multimodal_image" -> (qMultimodalImage _))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_image" -> multimodalImageSql)
}
