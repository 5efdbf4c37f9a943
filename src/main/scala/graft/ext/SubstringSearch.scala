package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Indexed exact substring search — the contamination-hunter's primitive:
  * given a table of query strings (leaked benchmark lines, canary strings,
  * PII seeds), find every document containing each one VERBATIM, without
  * running |queries| full-corpus `contains` scans.
  *
  * Index shape: one corpus pass explodes each document's DISTINCT
  * character k-grams (native [[graft.functions.CharNgrams]] — scan-local,
  * codegen) into a (gram, doc_id) posting table; each query selects ONE of
  * its own k-grams — the (hash, gram)-argmin, a deterministic stand-in for
  * the rarest gram that both engines replay — and candidate retrieval is a
  * BROADCAST join of those few selected grams against the posting rows, so
  * the posting table never shuffles. Any document containing the query
  * must contain every one of its k-grams, so the posting hit-list is a
  * SUPERSET of the true matches and one `contains` verification on the
  * candidates (not the corpus) finishes the job — the same
  * candidates ⊇ truth → verify discipline as every dedup path here.
  *
  * Output per query: (query_id, gram, n_candidates, n_matches) —
  * n_candidates / n_matches is the index's selectivity read; a gram shared
  * with half the corpus means the query needs a longer/rarer gram, the
  * tuning decision this audit surfaces.
  */
object SubstringSearch {

  def searchCounts(docs: DataFrame, idCol: String, textCol: String,
                   queries: DataFrame, qidCol: String, qCol: String,
                   gramLen: Int = 8): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    // selected gram per query: (hash32, gram)-argmin over the query's grams
    val sel = queries
      .select(col(qidCol).as("qid"), col(qCol).as("q"))
      .filter(length(col("q")) >= gramLen)
      .select(col("qid"), col("q"),
        explode(array_distinct(
          graft.functions.CharNgrams.ngrams(col("q"), gramLen))).as("g"))
      .withColumn("h",
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"))
      .groupBy(col("qid"))
      .agg(min(col("q")).as("q"),
        min(struct(col("h"), col("g"))).as("m"))
      .select(col("qid"), col("q"), col("m.g").as("gram"))
    val posting = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(
          graft.functions.CharNgrams.ngrams(col(textCol), gramLen)))
          .as("gram"))
    val candidates = posting.join(broadcast(sel), "gram")
    candidates
      .join(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("__text")), "doc_id")
      .groupBy(col("qid"), col("gram"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("__text").contains(col("q")), 1L).otherwise(0L))
          .as("n_matches"))
      .select(col("qid").as("query_id"), col("gram"),
        col("n_candidates"), col("n_matches"))
      .orderBy(col("query_id"))
  }
}
