package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus boilerplate detection and memorization auditing — the two text-side
  * gates a training-data pipeline runs right before (boilerplate strip) and
  * right after (memorization audit) a training run.
  *
  * The reference corpus (`/root/reference/recmetrics_pyspark`) has no text
  * operators at all; these extend the engine per the north star. Shapes follow
  * the public CCNet / Gopher recipes: boilerplate is a *within-source*
  * document-frequency cut over text units, and memorization risk is measured
  * as the deepest n-gram order a held-out document shares with the training
  * split (Carlini et al.'s "extractability" reduced to set containment).
  */
object Boilerplate {

  /** Array of consecutive `chunkTokens`-token chunks of `textCol` (last chunk
    * may be shorter) — the native codegen kernel
    * ([[graft.functions.WordChunks]]; the composable
    * transform/sequence/slice formulation runs interpreted). Shared by the
    * batch operator and the streaming twin.
    */
  def chunkArray(textCol: org.apache.spark.sql.Column,
                 chunkTokens: Int): org.apache.spark.sql.Column =
    graft.functions.WordChunks.chunks(textCol, chunkTokens)

  /** CCNet-style boilerplate detection at chunk granularity: split every
    * document into consecutive `chunkTokens`-token chunks, count each chunk's
    * document frequency *within its source group*, flag chunks whose
    * doc-frequency is ≥ `minDocFrac` of the group's documents, and report
    * per-document how much text a boilerplate strip would remove.
    *
    * CCNet uses physical lines as the unit; this corpus has no line structure,
    * so the unit is a fixed token window (the parameter keeps the operator
    * honest for corpora that do have lines — pre-split on `\n` and pass 1-line
    * chunks). The doc-frequency threshold is quantized to 1/1000ths so the
    * boiler flag is exact integer arithmetic on both engines.
    *
    * 100 TB shape: chunking is per-row codegen (`transform` over the token
    * array — no shuffle, no UDF); the doc-frequency table shuffles once on
    * (group, chunk) and the per-doc rollup once on doc id — both linear in
    * corpus token count. The boilerplate table is joined back on the same
    * (group, chunk) key, so no second chunk shuffle materializes. Nothing is
    * collected; no group's chunk vocabulary needs to fit anywhere in
    * particular.
    *
    * Output per document:
    * (idCol, grp, n_chunks, n_boiler_chunks, n_tokens, boiler_token_frac).
    */
  def chunkBoilerplate(docs: DataFrame, groupCol: String, idCol: String,
                       textCol: String, chunkTokens: Int = 2,
                       minDocFrac: Double = 0.2): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(minDocFrac > 0 && minDocFrac <= 1,
      s"minDocFrac must be in (0, 1], got $minDocFrac")
    val fracMil = math.round(minDocFrac * 1000)

    val chunks = docs
      .select(col(groupCol).as("grp"), col(idCol),
        posexplode(chunkArray(col(textCol), chunkTokens)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
      .withColumn("clen", size(split(col("chunk"), " ")))

    val groupDocs = docs.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
    // doc-frequency per (group, chunk); a doc repeating a chunk counts once
    val chunkDf = chunks.select(col("grp"), col("chunk"), col(idCol)).distinct()
      .groupBy(col("grp"), col("chunk"))
      .agg(count(lit(1)).as("df_docs"))
      .join(broadcast(groupDocs), Seq("grp"))
      .withColumn("is_boiler",
        col("df_docs") * 1000 >= lit(fracMil) * col("n_docs"))
      .select(col("grp"), col("chunk"), col("is_boiler"))

    chunks.join(chunkDf, Seq("grp", "chunk"))
      .groupBy(col(idCol), col("grp"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler_chunks"),
        sum(col("clen")).cast("long").as("n_tokens"),
        sum(when(col("is_boiler"), col("clen")).otherwise(lit(0)))
          .cast("long").as("__btoks"))
      .select(col(idCol), col("grp"), col("n_chunks"), col("n_boiler_chunks"),
        col("n_tokens"),
        round(col("__btoks").cast("double") / col("n_tokens"), 6)
          .as("boiler_token_frac"))
  }

  /** Memorization-depth audit: for every held-out document, the deepest
    * n-gram order in `ns` at which it still shares at least one word n-gram
    * with the training split (0 when none match even at the shallowest
    * order). Shallow orders matching is expected English; a deep order
    * (8-gram+) matching is verbatim leakage the dedup/decontamination stages
    * missed. Per order also emits a hit flag, so the result doubles as the
    * leakage-rate-by-depth curve after one aggregation.
    *
    * 100 TB shape: one distinct-shingle set + equi-join per order — linear in
    * corpus size, shuffled on the shingle hash; no pairwise work and nothing
    * driver-side. At real scale the train side's distinct set would ride
    * behind a Bloom prefilter ([[TextQuality.contaminationBloom]] is the
    * established seam); the exact join stays the semantics either way.
    *
    * Output per held-out doc: (idCol, shared_n<k> flags..., max_shared_n).
    */
  def memorizationDepth(train: DataFrame, heldout: DataFrame, idCol: String,
                        textCol: String,
                        ns: Seq[Int] = Seq(3, 5, 8)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"orders must be >= 1, got $ns")
    val hits = ns.map { n =>
      val trainSh = Dedup.shingles(train, idCol, textCol, n)
        .select(col("shingle")).distinct()
      Dedup.shingles(heldout, idCol, textCol, n)
        .join(trainSh, Seq("shingle"), "left_semi")
        .select(col(idCol)).distinct()
        .withColumn("n", lit(n))
    }.reduce(_ unionByName _)
    val agged = hits.groupBy(col(idCol))
      .agg(max(col("n")).as("max_shared_n"),
        ns.map(n => max(when(col("n") === n, true).otherwise(false))
          .as(s"shared_$n")): _*)
    val flags = ns.map(n => coalesce(col(s"shared_$n"), lit(false))
      .as(s"shared_$n"))
    heldout.select(col(idCol)).distinct()
      .join(agged, Seq(idCol), "left")
      .select(col(idCol) +: flags :+
        coalesce(col("max_shared_n"), lit(0)).as("max_shared_n"): _*)
  }
}
