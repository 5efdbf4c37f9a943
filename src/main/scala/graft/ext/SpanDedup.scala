package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level exact deduplication with document reassembly — the C4/RefinedWeb
  * preprocessing step that strips boilerplate lines (nav bars, cookie banners,
  * license headers) by keeping only the globally-FIRST occurrence of each
  * distinct line and rebuilding every document from its surviving lines.
  *
  * Generalized here to fixed word-count spans so it also covers corpora whose
  * text has no newline structure (split on `\n` and the span grouping becomes
  * the identity — same operator).
  *
  * Scale shape: explode → two hash aggregates → broadcast-free equi-join →
  * per-doc reassembly aggregate. The first-occurrence winner is a min-STRUCT
  * aggregate keyed by span text (map-side partial absorbs hot boilerplate
  * spans), NOT a `row_number` window — a window would funnel every copy of a
  * hot span through one task. Reassembly sorts each doc's kept spans inside the
  * aggregate (`sort_array` of (span_id, text) structs), so no ordering is
  * assumed of shuffle delivery.
  */
object SpanDedup {

  /** Split each doc into `spanWords`-word spans and drop every span that
    * already occurred in an earlier doc (or earlier in the same doc). Output:
    * (id, n_spans, n_kept, text_deduped) — one row per input doc, empty string
    * when nothing survives.
    */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                spanWords: Int): DataFrame = {
    require(spanWords > 0, "spanWords must be positive")
    val spans = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .withColumn("span_id", expr(s"pos div $spanWords"))
      .groupBy(col(idCol), col("span_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x("word"))).as("span_text"))
    // Globally-first occurrence per distinct span text: min over (doc, span)
    // pairs — an aggregate, not a window, so hot spans stay map-side-partial.
    val firsts = spans
      .groupBy(col("span_text"))
      .agg(min(struct(col(idCol).as("d"), col("span_id").as("s"))).as("f"))
    val kept = spans
      .join(firsts, "span_text")
      .filter(col(idCol) === col("f.d") && col("span_id") === col("f.s"))
    val perDoc = spans.groupBy(col(idCol)).agg(count(lit(1)).as("n_spans"))
    val keptAgg = kept
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("span_id"), col("span_text")))),
            x => x("span_text"))).as("text_deduped"))
    perDoc.join(keptAgg, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }
}
