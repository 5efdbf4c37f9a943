package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-hashed bag-of-words document vectors (the hashing trick —
  * Weinberger et al., ICML 2009): each token maps to a dimension
  * `md5(token) mod D` with a deterministic ±1 sign from the next hash bit,
  * giving every document a fixed-D integer vector with NO vocabulary table,
  * no fitting, and unbiased inner products in expectation. This is the
  * bridge from the text side of the engine to the embedding side: hashed
  * vectors feed the same cosine/ANN machinery ([[SimSearch]],
  * [[Clustering]]) when no learned embeddings exist yet.
  *
  * Everything stays RELATIONAL — a vector is (doc, dim, v) rows, dots are
  * an equi-join on dim, norms a per-doc aggregate — so the sketch is
  * oracle-checkable end to end and never materializes arrays. All vector
  * components and dot products are exact integers; only the final
  * cosine division is floating point (deterministic IEEE).
  *
  * Scale shape: one token explode + (doc, dim) groupBy (map-side combined,
  * ≤ D partials per doc); similarity probes join the ≤ D-row query vector
  * (broadcast) against the vector table on dim — work is linear in docs
  * sharing a dimension with the query, never all-pairs.
  */
object HashedEmbedding {

  private def h32(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** (idCol, dim, v) signed hashed counts; dims in [0, dims). */
  def hashedVectors(docs: DataFrame, idCol: String, textCol: String,
                    dims: Int): DataFrame = {
    require(dims >= 2 && dims <= 4096, s"dims $dims out of range")
    val toks = docs
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    toks
      .select(col(idCol), h32(col("tok")).as("h"))
      .select(col(idCol), (col("h") % dims).as("dim"),
        when(expr(s"(h div $dims) % 2") === 0, lit(1L)).otherwise(lit(-1L))
          .as("sign"))
      .groupBy(col(idCol), col("dim")).agg(sum(col("sign")).as("v"))
      .filter(col("v") =!= 0)
  }

  /** Top-k documents by hashed-BoW cosine against one query document.
    * Output per rank asc: (rank, idCol, dot, cosine) — self excluded,
    * zero-norm docs excluded, ties broken by id.
    */
  def topKSimilar(docs: DataFrame, idCol: String, textCol: String,
                  queryId: Long, k: Int, dims: Int = 64): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val vecs = hashedVectors(docs, idCol, textCol, dims)
    val norms = vecs.groupBy(col(idCol))
      .agg(sum(col("v") * col("v")).as("n2"))
    val qv = vecs.filter(col(idCol) === queryId)
      .select(col("dim"), col("v").as("qv"))
    val qn = norms.filter(col(idCol) === queryId)
      .select(col("n2").as("qn2"))
    val dots = vecs.filter(col(idCol) =!= queryId)
      .join(broadcast(qv), Seq("dim"))
      .groupBy(col(idCol)).agg(sum(col("v") * col("qv")).as("dot"))
    val scored = dots.join(norms, Seq(idCol)).crossJoin(broadcast(qn))
      .select(col(idCol), col("dot"),
        (col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("qn2").cast("double"))))
          .as("cosine"))
    val top = scored.orderBy(col("cosine").desc, col(idCol)).limit(k)
    // rank the bounded top-k (post-limit window is ScaleGuard-silent)
    import org.apache.spark.sql.expressions.Window
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("cosine").desc, col(idCol))))
      .select(col("rank"), col(idCol), col("dot"), col("cosine"))
  }
}
