package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking — the retrieval/RAG preprocessing
  * step that splits each document into fixed-size token windows with overlap
  * (context preserved across boundaries) before embedding or indexing.
  *
  * Chunk starts are `1, 1+stride, …` up to `max(1, n − (size − stride))`, so
  * every token is covered, consecutive chunks overlap by `size − stride`
  * tokens, and the final chunk may run short. Documents at or under `size`
  * tokens yield exactly one chunk.
  *
  * Pure scan-side generate: split → sequence of starts → posexplode → slice.
  * Zero shuffles, codegen throughout — scan-bandwidth-bound at any corpus
  * size, and the explode fan-out is rows × ⌈n/stride⌉ (bounded by document
  * length, not corpus size).
  */
object Chunking {

  /** Chunk `textCol` into `size`-token windows every `stride` tokens.
    * Output: (idCol, chunk_idx 1-based, start_token 1-based, n_tokens,
    * chunk_sig = 16-hex-char md5 prefix of the chunk text) — the signature
    * keeps the output compact and join-ready for chunk-level dedup.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int = 50, stride: Int = 40): DataFrame = {
    require(stride >= 1 && size >= stride,
      s"need 1 <= stride ($stride) <= size ($size)")
    val toks = split(col(textCol), " ")
    val starts = sequence(lit(1),
      greatest(org.apache.spark.sql.functions.size(toks) - lit(size - stride),
        lit(1)),
      lit(stride))
    val len = least(lit(size),
      org.apache.spark.sql.functions.size(col("__t")) - col("__s") + 1)
    df.select(col(idCol), toks.as("__t"),
        posexplode(starts).as(Seq("__pos", "__s")))
      .select(col(idCol), (col("__pos") + 1).cast("long").as("chunk_idx"),
        col("__s").cast("long").as("start_token"),
        len.cast("long").as("n_tokens"),
        substring(md5(array_join(slice(col("__t"), col("__s"), len), " ")),
          1, 16).as("chunk_sig"))
  }
}
