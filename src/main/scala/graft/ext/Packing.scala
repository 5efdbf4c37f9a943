package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row shape for [[Packing.packGreedy]]'s typed per-group fold. */
final case class PackedDoc(group: String, id: Long, n_tokens: Long, seq_id: Long)

/** Sequence packing for LLM pre-training: documents are laid end-to-end in a
  * deterministic order and the concatenated token stream is cut into fixed-length
  * training sequences ("concat-and-chunk", the standard GPT-style data layout).
  * The operator answers, per document: where in the stream it starts, which
  * sequences it lands in, and whether it straddles a sequence boundary — the
  * bookkeeping a tokenize-and-shard job needs to write packed training files.
  *
  * North-star extension beyond the reference (SURVEY.md §7.2.6): the reference has
  * no packing surface; this is the missing step between a curated corpus and
  * trainer-ready shards.
  *
  * Scale shape: one window per pack group (`partitionBy(groupCol)`) computing a
  * running token prefix sum — parallel across groups (sources/shards), no global
  * sort, no single-partition window. A 100 TB corpus packs per-shard by
  * construction: the group key IS the output shard, so each executor owns whole
  * sequences and no token stream ever crosses machines. Degenerate single-group
  * use at extreme size would serialize into one partition — shard first (any
  * deterministic doc_id bucketing) exactly as production tokenizers do.
  */
object Packing {

  /** Per-document chunk assignment packing `nTokensCol` tokens per doc into
    * sequences of `seqLen` tokens within each `groupCol` stream, docs ordered by
    * `idCol`. Output adds:
    *  - `tok_start`: the doc's offset in its group's concatenated token stream
    *  - `seq_first` / `seq_last`: first/last sequence index the doc occupies
    *  - `n_seqs`: how many sequences the doc touches (>1 ⇒ split across chunks)
    *
    * Zero-token docs occupy no positions: they report the sequence they would
    * start in (`seq_last` = `seq_first`, `n_seqs` = 1) and never span.
    */
  def packChunks(df: DataFrame, idCol: String, groupCol: String,
                 nTokensCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val before = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val n = col(nTokensCol)
    val seqOf = (tok: org.apache.spark.sql.Column) =>
      floor(tok / lit(seqLen.toDouble)).cast("long")
    df.withColumn("tok_start", coalesce(sum(n).over(before), lit(0L)))
      .withColumn("seq_first", seqOf(col("tok_start")))
      .withColumn("seq_last",
        when(n <= 0, col("seq_first"))
          .otherwise(seqOf(col("tok_start") + n - 1)))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }

  /** Greedy document-boundary packing — the SFT-style layout where NO document
    * is split: within each group (docs in `idCol` order), a sequence closes
    * when the next doc would push it past `seqLen` tokens; a doc longer than
    * `seqLen` occupies a sequence alone. Output: (group, id, n_tokens, seq_id),
    * seq_id 0-based per group.
    *
    * The fold is inherently sequential per group (each decision depends on the
    * running fill), so it runs as a typed `flatMapGroups`: one shuffle keyed by
    * group, then a per-group in-memory sort+fold — parallel ACROSS groups,
    * which is the real parallelism at 100 TB exactly as in [[packChunks]] (the
    * group key is the output shard). Each group must fit one executor's heap;
    * shard oversized groups first (any deterministic id bucketing) — same
    * contract as production sequence packers.
    */
  def packGreedy(df: DataFrame, idCol: String, groupCol: String,
                 nTokensCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(nTokensCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val docs = it.toArray.sortBy(_._2)
        var seq = -1L
        var acc = 0L
        docs.iterator.map { case (_, id, n) =>
          if (seq < 0 || acc + n > seqLen) { seq += 1; acc = n }
          else acc += n
          PackedDoc(g, id, n, seq)
        }
      }
      .toDF("__g", idCol, nTokensCol, "seq_id")
      .withColumnRenamed("__g", groupCol)
  }

  /** Padding-waste audit for length-bucketed batching — the sizing table
    * behind the pack-vs-pad decision: bucket every document to the smallest
    * power-of-two length ≥ its token count and report, per bucket, how many
    * tokens a pad-to-bucket batcher would burn vs the packed ideal. High
    * waste share in the short buckets is the classic signal to switch that
    * tier to sequence packing ([[packFirstFit]]).
    *
    * Buckets are assigned by an explicit CASE ladder over `bucketLens`
    * (ascending powers of two), NOT `2^ceil(log2 n)` — the float log lands on
    * 5.0000000000000004 at exact powers and mis-buckets them differently per
    * engine. Docs longer than the last bucket land in bucket −1 ("oversize",
    * they need chunking, not padding). One scan + one tiny aggregate.
    * Output per bucket: (bucket_len, n_docs, sum_tokens, padded_tokens,
    * waste_tokens, waste_share).
    */
  def padWasteByBucket(df: DataFrame, textCol: String,
                       bucketLens: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024)): DataFrame = {
    require(bucketLens.nonEmpty && bucketLens == bucketLens.sorted,
      s"bucketLens must be ascending: $bucketLens")
    val n = size(split(col(textCol), " "))
    val bucket = bucketLens.reverse.foldLeft(lit(-1L)) { (acc, b) =>
      when(n <= b, lit(b.toLong)).otherwise(acc)
    }
    df.select(bucket.as("bucket_len"), n.cast("long").as("__n"))
      .groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("sum_tokens"))
      .select(col("bucket_len"), col("n_docs"), col("sum_tokens"),
        when(col("bucket_len") > 0, col("bucket_len") * col("n_docs"))
          .otherwise(col("sum_tokens")).as("padded_tokens"))
      .withColumn("waste_tokens", col("padded_tokens") - col("sum_tokens"))
      .withColumn("waste_share",
        round(col("waste_tokens").cast("double") / col("padded_tokens"), 6))
  }
}
