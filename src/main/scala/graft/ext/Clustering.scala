package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space clustering primitives for semantic dedup (SemDeDup-style:
  * cluster the corpus, then compare only within clusters).
  *
  * [[assignToCentroids]] is the deterministic assignment half of k-means — it
  * composes with ANY small centroid table: MLlib KMeans centers
  * ([[SimSearch.ivfIndex]] — the production quantizer), or seed vectors picked
  * by id (what the oracle-checked query uses, so the result is reproducible
  * across engines).
  *
  * Scale shape: centroids are broadcast (k rows), assignment is one scan with a
  * codegen'd dot product per (row, centroid) and a min-struct argmax aggregate —
  * no shuffle of the embedding column beyond the per-id argmax. The dup-pair
  * join is an equi-join on the assigned cluster, bounding the quadratic term to
  * cluster size (the same blocking idea as [[Dedup.embeddingDupPairs]]'s
  * sign-LSH buckets, but with data-driven cells; a hot cluster is split by
  * raising k or sub-clustering the offender).
  */
object Clustering {

  /** Assign each vector to its highest-cosine centroid. Output:
    * (id, centroid_id, cosine). Ties break toward the smaller centroid id;
    * zero-norm vectors score 0 against everything.
    */
  def assignToCentroids(vecs: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, cidCol: String,
                        cvecCol: String): DataFrame = {
    val v = vecs.select(col(idCol), col(vecCol),
      SimSearch.norm(col(vecCol)).as("__nv"))
    val c = centroids.select(col(cidCol).as("__cid"), col(cvecCol).as("__cv"),
      SimSearch.norm(col(cvecCol)).as("__nc"))
    val cos = when(col("__nv") === 0 || col("__nc") === 0, lit(0.0))
      .otherwise(SimSearch.dot(col(vecCol), col("__cv")) / (col("__nv") * col("__nc")))
    v.crossJoin(broadcast(c))
      .select(col(idCol), col("__cid"), cos.as("__cos"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__cos")).as("neg"), col("__cid").as("cid"),
        col("__cos").as("cos"))).as("__b"))
      .select(col(idCol), col("__b.cid").as("centroid_id"),
        col("__b.cos").as("cosine"))
  }

  /** Simplified silhouette per cluster — the clustering-quality gauge that
    * makes the "raise k or sub-cluster the offender" decision above
    * measurable. Per vector: a = cosine distance (1 − cos) to its own
    * centroid, b = distance to the best OTHER centroid,
    * s = (b − a) / max(a, b) ∈ [−1, 1] (degenerate max(a,b)=0 → 0). The
    * classic silhouette compares against every point (O(n²)); the simplified
    * form substitutes centroids (Hruschka et al.) and is the only one that
    * scales — O(n·k), same envelope as assignment itself.
    *
    * Output: (centroid_id, n_vectors, mean_silhouette), means through
    * DECIMAL(18,8) sums. Scale shape: broadcast centroids, per-vector window
    * over k rows, centroid-keyed final agg — no vector ever joins a vector.
    */
  def simplifiedSilhouette(vecs: DataFrame, idCol: String, vecCol: String,
                           centroids: DataFrame, cidCol: String,
                           cvecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vecs.select(col(idCol), col(vecCol),
      SimSearch.norm(col(vecCol)).as("__nv"))
    val c = centroids.select(col(cidCol).as("__cid"), col(cvecCol).as("__cv"),
      SimSearch.norm(col(cvecCol)).as("__nc"))
    val cos = when(col("__nv") === 0 || col("__nc") === 0, lit(0.0))
      .otherwise(SimSearch.dot(col(vecCol), col("__cv")) / (col("__nv") * col("__nc")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__cos").desc, col("__cid"))
    val ranked = v.crossJoin(broadcast(c))
      .select(col(idCol), col("__cid"), cos.as("__cos"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 2)
    val best = ranked.filter(col("__rk") === 1)
      .select(col(idCol), col("__cid").as("centroid_id"),
        (lit(1.0) - col("__cos")).as("__a"))
    val second = ranked.filter(col("__rk") === 2)
      .select(col(idCol), (lit(1.0) - col("__cos")).as("__b"))
    best.join(second, idCol)
      .select(col("centroid_id"),
        when(greatest(col("__a"), col("__b")) === 0, lit(0.0))
          .otherwise((col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .cast("decimal(18,8)").as("__s"))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("__s")).cast("double") / count(lit(1)), 6)
          .as("mean_silhouette"))
  }

  /** Semantic near-dup pairs via centroid blocking: pairs sharing a nearest
    * centroid with cosine ≥ `threshold`. Output: (id_a, id_b, cosine), a < b.
    */
  def centroidDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                       centroids: DataFrame, cidCol: String, cvecCol: String,
                       threshold: Double): DataFrame = {
    val assigned = assignToCentroids(vecs, idCol, vecCol, centroids, cidCol, cvecCol)
      .select(col(idCol), col("centroid_id"))
    val n = vecs
      .select(col(idCol), col(vecCol), SimSearch.norm(col(vecCol)).as("__n"))
      .join(assigned, idCol)
    val a = n.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col("__n").as("__na"), col("centroid_id"))
    val b = n.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col("__n").as("__nb"), col("centroid_id"))
    a.join(b, "centroid_id")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (SimSearch.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** kNN label-noise screen (confident-learning-lite): flag every vector
    * whose own label disagrees with the majority label of its `k` highest-
    * cosine anchors — the triage list a labeling-QA pass reviews first.
    * Majority ties break toward the smaller label, anchor-rank ties toward
    * the smaller anchor id, so the flag set is deterministic.
    *
    * Scale shape: anchors broadcast (they're a curated set, not the corpus),
    * each vector ranks its |anchors| candidates in a per-vector window —
    * shuffle carries (id, label, cosine) triples, never a second copy of the
    * embedding — and the vote is a (vector, label)-keyed count. Output, one
    * row per FLAGGED vector: (id, label, pred_label, n_votes).
    */
  def labelNoiseByKnn(vecs: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, anchors: DataFrame, aidCol: String,
                      avecCol: String, alabelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = anchors.select(col(aidCol).as("__aid"), col(avecCol).as("__av"),
      col(alabelCol).as("__al"), SimSearch.norm(col(avecCol)).as("__an"))
    val v = vecs.select(col(idCol), col(vecCol), col(labelCol),
      SimSearch.norm(col(vecCol)).as("__nv"))
    val cos = when(col("__nv") === 0 || col("__an") === 0, lit(0.0))
      .otherwise(SimSearch.dot(col(vecCol), col("__av")) / (col("__nv") * col("__an")))
    val wRank = Window.partitionBy(col(idCol))
      .orderBy(col("__cos").desc, col("__aid"))
    val topK = v.crossJoin(broadcast(a))
      .select(col(idCol), col(labelCol), col("__aid"), col("__al"), cos.as("__cos"))
      .withColumn("__rk", row_number().over(wRank))
      .filter(col("__rk") <= k)
    val wVote = Window.partitionBy(col(idCol))
      .orderBy(col("__n").desc, col("__al"))
    topK.groupBy(col(idCol), col(labelCol), col("__al"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__vr", row_number().over(wVote))
      .filter(col("__vr") === 1 && col("__al") =!= col(labelCol))
      .select(col(idCol), col(labelCol), col("__al").as("pred_label"),
        col("__n").as("n_votes"))
  }

  /** Full Lloyd k-means iterations over cosine similarity — the iterative
    * completion of [[assignToCentroids]] (which is one half-step): each
    * round assigns every vector to its highest-cosine centroid (ties to the
    * smaller centroid id), then recomputes each centroid as the per-
    * dimension MEAN of its members. Plain means (not renormalized) keep the
    * update oracle-expressible; cosine against an unnormalized mean centroid
    * is scale-invariant in the centroid anyway.
    *
    * Exactness: per-dimension member sums pool in DECIMAL(18,9) (float
    * components widen to double exactly, then quantize identically on both
    * engines), so the new centroids are bit-identical doubles; cosines fold
    * the 64 products in array order on both engines (dotGeneric ⇔
    * list_sum∘list_transform). A cluster that loses all members simply
    * drops out of the next round (documented; k shrinks).
    *
    * Scale shape per round: assignment is the broadcast-centroid scan +
    * per-id argmax (no vector-vector join); the update is ONE
    * (cid, dim)-keyed aggregate over posexploded members (map-side
    * combined, 64·k partial rows per task) rebuilt into arrays with a
    * sorted collect_list over 64 rows per cid. Rounds are a driver-side
    * loop of `iters` fixed plans — no lineage blowup at small iters (the
    * dupClusters checkpoint discipline applies if iters grows).
    *
    * Output after the final assignment, one row per surviving centroid:
    * (centroid_id, n_members, mean_cos) — mean cosine DECIMAL(18,8)-pooled.
    */
  def lloydIterations(vecs: DataFrame, idCol: String, vecCol: String,
                      centroids0: DataFrame, cidCol: String, cvecCol: String,
                      iters: Int, dims: Int): DataFrame = {
    val cents = lloydCentroids(vecs, idCol, vecCol, centroids0, cidCol,
      cvecCol, iters, dims)
    val v = lloydPrep(vecs, idCol, vecCol)
    lloydAssign(v, idCol, vecCol, cents)
      .groupBy(col("cid").as("centroid_id"))
      .agg(count(lit(1)).as("n_members"),
        (sum(col("cos").cast("decimal(18,8)")).cast("double") /
          count(lit(1))).as("mean_cos"))
  }

  /** The centroid TABLE after `iters` Lloyd rounds — the training half of
    * [[lloydIterations]], exposed so an IVF index build
    * ([[SimSearch.ivfTrainedWriteIndex]]) can consume the learned quantizer
    * instead of re-deriving it. Output: (cid, cvec array<double>); a cluster
    * that loses all members drops out (k shrinks), exactly as in
    * [[lloydIterations]].
    */
  def lloydCentroids(vecs: DataFrame, idCol: String, vecCol: String,
                     centroids0: DataFrame, cidCol: String, cvecCol: String,
                     iters: Int, dims: Int): DataFrame = {
    require(iters >= 1 && dims >= 1, s"bad iters=$iters dims=$dims")
    val v = lloydPrep(vecs, idCol, vecCol)
    var cents = centroids0.select(col(cidCol).as("cid"),
      col(cvecCol).cast("array<double>").as("cvec"))
    for (_ <- 1 to iters) {
      val assigned = lloydAssign(v, idCol, vecCol, cents)
      cents = assigned.select(col(idCol), col("cid"))
        .join(v.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("__pos", "__x")))
        .groupBy(col("cid"), col("__pos"))
        .agg(sum(col("__x").cast("double").cast("decimal(18,9)")).as("__s"),
          count(lit(1)).as("__n"))
        .select(col("cid"), col("__pos"),
          (col("__s").cast("double") / col("__n")).as("__mu"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__mu")))),
          e => e.getField("__mu")).as("cvec"))
    }
    cents
  }

  /** (id, vec, ‖vec‖) projection shared by the Lloyd steps — dotGeneric (the
    * fold-in-array-order form) rather than the native kernel so every
    * downstream cosine is the exact expression the DuckDB oracle folds.
    */
  private[graft] def lloydPrep(vecs: DataFrame, idCol: String,
                               vecCol: String): DataFrame =
    vecs.select(col(idCol), col(vecCol),
      sqrt(SimSearch.dotGeneric(col(vecCol), col(vecCol))).as("__nv"))

  /** Cosine-argmax assignment of [[lloydPrep]] rows to a centroid table
    * (cid, cvec): ties to the smaller cid, zero-norm vectors score 0.
    * Output: (id, cid, cos). Centroids broadcast; one per-id argmax agg.
    */
  private[graft] def lloydAssign(v: DataFrame, idCol: String, vecCol: String,
                                 cents: DataFrame): DataFrame = {
    val c = cents.select(col("cid").as("__cid"), col("cvec").as("__cv"),
      sqrt(SimSearch.dotGeneric(col("cvec"), col("cvec"))).as("__nc"))
    val cos = when(col("__nv") === 0 || col("__nc") === 0, lit(0.0))
      .otherwise(SimSearch.dotGeneric(col(vecCol), col("__cv")) /
        (col("__nv") * col("__nc")))
    v.crossJoin(broadcast(c))
      .select(col(idCol), col("__cid"), cos.as("__cos"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__cos")).as("neg"), col("__cid").as("cid"),
        col("__cos").as("cos"))).as("__b"))
      .select(col(idCol), col("__b.cid").as("cid"), col("__b.cos").as("cos"))
  }
}
