package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 registry: WordPiece greedy encoding (the third tokenizer
  * family), the cross-family fertility comparison, and URL
  * canonicalization / dedup — each paired with a DuckDB oracle that
  * independently replays the semantics.
  */
object MeridianQueries {

  /** The committed unigram vocabulary fixture for this scale factor — the
    * WordPiece vocabulary input ("vocab is a fixture table": both engines
    * read the SAME frozen piece list, so the oracle exercises the greedy
    * matcher, not the trainer).
    */
  private def unigramVocab(spark: SparkSession, dir: String): Seq[String] = {
    val sfName = new java.io.File(dir).getName
    val schema = StructType(Seq(
      StructField("rank", LongType), StructField("piece", StringType),
      StructField("count", LongType), StructField("logp", DoubleType)))
    spark.read.option("header", "true").schema(schema)
      .csv(s"${SparkEntry.FixtureRoot}/$sfName/q_unigram_train.csv")
      .select("piece").collect().map(_.getString(0)).toSeq
  }

  private val vocabCsvSql: String =
    s"""read_csv('${SparkEntry.FixtureRoot}/__GRAFT_SF__/q_unigram_train.csv',
       |  header=true, columns={'rank':'BIGINT','piece':'VARCHAR',
       |  'count':'BIGINT','logp':'DOUBLE'})""".stripMargin

  // --------------------------------------------------------------------
  // WordPiece greedy encode
  // --------------------------------------------------------------------

  /** Greedy longest-match (WordPiece-style) encode of the corpus over the
    * frozen unigram vocabulary ([[graft.ext.WordPiece.encode]]). Unlike
    * the BPE/unigram APPLY queries this one is fully oracle-expressible:
    * the DuckDB side walks the same maximal-munch recursion with a
    * recursive CTE over a per-position longest-match table.
    */
  def qWordpieceEncode(spark: SparkSession, dir: String): DataFrame =
    graft.ext.WordPiece.encode(Tables.documents(spark, dir), "doc_id",
        "text", unigramVocab(spark, dir))
      .orderBy(col("doc_id"))

  private val wordpieceWalkSql: String =
    """docw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |dw AS (SELECT doc_id, word FROM docw WHERE word <> ''),
      |uw AS (SELECT DISTINCT word FROM dw),
      |pos AS (SELECT word, unnest(generate_series(1, len(word))) AS p
      |  FROM uw),
      |lm AS (SELECT pos.word, pos.p, MAX(len(v.piece)) AS l
      |  FROM pos JOIN vocab v
      |    ON substr(pos.word, pos.p, len(v.piece)) = v.piece
      |  GROUP BY 1, 2),
      |walk(word, p, n, unk) AS (
      |  SELECT word, 1, 0, 0 FROM uw
      |  UNION ALL
      |  SELECT w.word, w.p + COALESCE(lm.l, 1), w.n + 1,
      |    w.unk + CASE WHEN lm.l IS NULL THEN 1 ELSE 0 END
      |  FROM walk w LEFT JOIN lm ON lm.word = w.word AND lm.p = w.p
      |  WHERE w.p <= len(w.word)),
      |tok AS (SELECT word, n, unk FROM walk WHERE p > len(word))""".stripMargin

  val wordpieceEncodeSql: String =
    s"""WITH RECURSIVE vocab AS (SELECT piece FROM $vocabCsvSql),
       |$wordpieceWalkSql,
       |per_doc AS (SELECT dw.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_tokens,
       |    COUNT(*) AS n_words, CAST(SUM(t.unk) AS BIGINT) AS n_unk
       |  FROM dw JOIN tok t USING (word) GROUP BY 1)
       |SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
       |  COALESCE(p.n_words, 0) AS n_words, COALESCE(p.n_unk, 0) AS n_unk
       |FROM documents d LEFT JOIN per_doc p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Cross-family fertility comparison
  // --------------------------------------------------------------------

  /** One row per language comparing tokens-per-word across the three
    * tokenizer families: BPE and unigram from their committed fertility
    * fixtures (their trainers are the frozen artifact), WordPiece computed
    * LIVE over the frozen vocabulary ([[graft.ext.WordPiece
    * .fertilityByGroup]]) — the language-skew dashboard a multilingual
    * pipeline reads before picking a tokenizer.
    */
  def qTokenizerCompare(spark: SparkSession, dir: String): DataFrame = {
    val sfName = new java.io.File(dir).getName
    val fertSchema = StructType(Seq(
      StructField("lang", StringType), StructField("n_docs", LongType),
      StructField("n_words", LongType), StructField("n_tokens", LongType),
      StructField("fertility", DoubleType),
      StructField("chars_per_token", DoubleType)))
    def fixture(name: String, grpCol: String): DataFrame =
      spark.read.option("header", "true")
        .schema(StructType(StructField(grpCol, StringType) +:
          fertSchema.fields.drop(1)))
        .csv(s"${SparkEntry.FixtureRoot}/$sfName/$name.csv")
    val bpe = fixture("q_tokenizer_fertility", "lang")
      .select(col("lang"), col("fertility").as("fertility_bpe"))
    val uni = fixture("q_unigram_fertility", "grp")
      .select(col("grp").as("lang"), col("fertility").as("fertility_unigram"))
    val wp = graft.ext.WordPiece.fertilityByGroup(
        Tables.documents(spark, dir), "doc_id", "text", "lang",
        unigramVocab(spark, dir))
      .select(col("grp").as("lang"), col("n_words"),
        col("fertility").as("fertility_wordpiece"))
    wp.join(bpe, Seq("lang")).join(uni, Seq("lang"))
      .select(col("lang"), col("n_words"), col("fertility_bpe"),
        col("fertility_unigram"), col("fertility_wordpiece"))
      .orderBy(col("lang"))
  }

  val tokenizerCompareSql: String =
    s"""WITH RECURSIVE vocab AS (SELECT piece FROM $vocabCsvSql),
       |$wordpieceWalkSql,
       |wp AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(t.n) AS BIGINT) AS n_tokens
       |  FROM dw JOIN tok t USING (word)
       |  JOIN documents d ON d.doc_id = dw.doc_id
       |  GROUP BY 1),
       |bpe AS (SELECT lang, fertility AS fertility_bpe FROM read_csv(
       |  '${SparkEntry.FixtureRoot}/__GRAFT_SF__/q_tokenizer_fertility.csv',
       |  header=true, columns={'lang':'VARCHAR','n_docs':'BIGINT',
       |  'n_words':'BIGINT','n_tokens':'BIGINT','fertility':'DOUBLE',
       |  'chars_per_token':'DOUBLE'})),
       |uni AS (SELECT grp AS lang, fertility AS fertility_unigram
       |  FROM read_csv(
       |  '${SparkEntry.FixtureRoot}/__GRAFT_SF__/q_unigram_fertility.csv',
       |  header=true, columns={'grp':'VARCHAR','n_docs':'BIGINT',
       |  'n_words':'BIGINT','n_tokens':'BIGINT','fertility':'DOUBLE',
       |  'chars_per_token':'DOUBLE'}))
       |SELECT wp.lang, wp.n_words, bpe.fertility_bpe, uni.fertility_unigram,
       |  ROUND(CAST(wp.n_tokens AS DOUBLE) / wp.n_words, 6)
       |    AS fertility_wordpiece
       |FROM wp JOIN bpe USING (lang) JOIN uni USING (lang)
       |ORDER BY wp.lang""".stripMargin

  // --------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wordpiece_encode" -> (qWordpieceEncode _),
    "q_tokenizer_compare" -> (qTokenizerCompare _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_wordpiece_encode" -> wordpieceEncodeSql,
    "q_tokenizer_compare" -> tokenizerCompareSql
  )
}
