package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016, arXiv:1508.07909) in
  * the standard word-frequency formulation: the corpus collapses to a
  * (word, freq) vocabulary ONCE — the only corpus-sized pass — and every merge
  * iteration runs over that far smaller table: count symbol-pair frequencies
  * weighted by word freq, pick the argmax pair, rewrite the vocabulary's
  * symbol sequences. This is the shape real tokenizer trainers use; here the
  * vocabulary itself stays distributed, so a web-scale corpus whose distinct
  * words do not fit one machine still trains.
  *
  * Per iteration the driver holds exactly ONE (pair, freq) row (the argmax —
  * a TakeOrderedAndProject, ties broken lexicographically for determinism);
  * the rewrite is a typed map over the vocab (per-row sequential merge — the
  * genuinely imperative kernel, like LongTail's prefix sum), checkpointed so
  * iteration i never replays iterations 1..i−1.
  *
  * Output: one row per learned merge — (rank, left, right, pair_freq).
  * No SQL oracle (the merge recurrence is not expressible without recursive
  * row-dependent rewriting); the gate is BpeTrainSpec's golden fixture from
  * the original paper's worked example.
  */
object BpeTrain {

  /** End-of-word marker, kept distinct from any character symbol so merges
    * cannot cross word boundaries (the paper's `</w>`).
    */
  val EndOfWord = "</w>"

  final case class VocabRow(symbols: Seq[String], freq: Long)
  final case class Merge(rank: Int, left: String, right: String, pair_freq: Long)

  /** Learn `nMerges` BPE merges from the corpus. `minFreq` prunes the long
    * tail of hapax words from the vocab table (they cannot win a merge early
    * and dominate its row count).
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            minFreq: Long = 1L): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the single corpus-sized pass: word frequencies
    val vocabDf = docs
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .filter(col("__f") >= minFreq)
    var vocab: Dataset[VocabRow] = vocabDf
      .as[(String, Long)]
      .map { case (w, f) => VocabRow(w.map(_.toString) :+ EndOfWord, f) }
      .localCheckpoint(eager = true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var iter = 0
    var exhausted = false
    while (iter < nMerges && !exhausted) {
      val top = bestPair(vocab)
      top match {
        case None => exhausted = true
        case Some((left, right, freq)) =>
          merges += Merge(iter + 1, left, right, freq)
          val old = vocab
          vocab = applyMerge(vocab, left, right).localCheckpoint(eager = true)
          old.unpersist()
          iter += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** DataFrame form of [[train]] for query surfaces. */
  def trainDF(spark: SparkSession, docs: DataFrame, textCol: String,
              nMerges: Int, minFreq: Long = 1L): DataFrame = {
    import spark.implicits._
    train(docs, textCol, nMerges, minFreq).toDF()
      .select(col("rank"), col("left"), col("right"), col("pair_freq"))
  }

  /** Encode documents with a learned merge list — the APPLY half of BPE:
    * per word, repeatedly merge the adjacent pair with the LOWEST merge rank
    * until none applies (the standard greedy encoding order — rank order, not
    * left-to-right discovery order). Output: (idCol, n_tokens, n_word_ends) —
    * the sequence-length accounting a packing/budget pipeline consumes.
    *
    * Scale shape: merges are vocabulary-sized (thousands) → one broadcast
    * map; encoding is embarrassingly parallel per row. The per-word loop is
    * O(symbols × applied merges) — the same kernel every tokenizer runs.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(rank)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val r = bc.value
        var nTokens = 0L
        var nWords = 0L
        text.split(" ").iterator.filter(_.nonEmpty).foreach { w =>
          nWords += 1
          var s = (w.map(_.toString) :+ EndOfWord).toArray
          var done = false
          while (!done && s.length > 1) {
            // lowest-rank applicable merge wins each round
            var best = Int.MaxValue; var bi = -1
            var i = 0
            while (i < s.length - 1) {
              val rk = r.getOrElse((s(i), s(i + 1)), Int.MaxValue)
              if (rk < best) { best = rk; bi = i }
              i += 1
            }
            if (bi < 0) done = true
            else {
              val l = s(bi); val rt = s(bi + 1)
              val out = new Array[String](s.length)
              // merge EVERY occurrence of this pair, left-to-right
              var j = 0; var k = 0
              while (j < s.length) {
                if (j + 1 < s.length && s(j) == l && s(j + 1) == rt) {
                  out(k) = l + rt; j += 2
                } else { out(k) = s(j); j += 1 }
                k += 1
              }
              s = java.util.Arrays.copyOf(out, k)
            }
          }
          nTokens += s.length
        }
        (id, nTokens, nWords)
      }
      .toDF(idCol, "n_tokens", "n_words")
  }

  /** Tokenizer fertility by group (language, source, domain …) — the
    * multilingual-tokenizer audit: fertility = BPE tokens per whitespace
    * word. A tokenizer trained on an English-heavy corpus fragments other
    * languages into many more subwords, which silently taxes their context
    * budget and training compute; this table is how that skew is measured
    * (cf. the fertility metric in the XLM-R / NLLB tokenizer analyses).
    *
    * Composes [[encode]] (embarrassingly parallel, broadcast merge ranks)
    * with one group-keyed aggregate. `chars_per_token` is the compression
    * view of the same skew (chars counted on the text column, whitespace
    * included — stated so the oracle matches). Output per group:
    * (group, n_docs, n_words, n_tokens, fertility, chars_per_token).
    */
  def fertilityByGroup(docs: DataFrame, idCol: String, textCol: String,
                       groupCol: String, merges: Seq[Merge]): DataFrame = {
    val enc = encode(docs, idCol, textCol, merges)
    docs.select(col(idCol), col(groupCol).as("grp"),
        length(col(textCol)).cast("long").as("__chars"))
      .join(enc, idCol)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"), sum(col("__chars")).as("__c"))
      .select(col("grp"), col("n_docs"), col("n_words"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_words"), 6).as("fertility"),
        round(col("__c").cast("double") / col("n_tokens"), 6).as("chars_per_token"))
  }

  /** Highest-frequency adjacent symbol pair (freq desc, then (left, right)
    * asc for determinism); None when no row has two symbols left.
    */
  private def bestPair(vocab: Dataset[VocabRow]): Option[(String, String, Long)] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    vocab.flatMap { r =>
        if (r.symbols.length < 2) Iterator.empty
        else r.symbols.iterator.zip(r.symbols.iterator.drop(1))
          .map { case (a, b) => ((a, b), r.freq) }
      }
      .groupByKey(_._1)
      .mapValues(_._2).reduceGroups(_ + _)
      .map { case ((a, b), f) => (a, b, f) }
      .orderBy(col("_3").desc, col("_1"), col("_2"))
      .limit(1)
      .collect().headOption
  }

  /** Rewrite every vocab row, merging each non-overlapping left-to-right
    * occurrence of (left, right) into one symbol — the sequential per-word
    * kernel of BPE (state across positions, so a typed map, not SQL).
    */
  private[ext] def applyMerge(vocab: Dataset[VocabRow], left: String,
                              right: String): Dataset[VocabRow] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    vocab.map { r =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      val s = r.symbols
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == left && s(i + 1) == right) {
          out += left + right; i += 2
        } else { out += s(i); i += 1 }
      }
      VocabRow(out.toSeq, r.freq)
    }
  }
}
