package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid, TPAMI 2011): split the
  * d-dimensional embedding into `m` contiguous subvectors, quantize each
  * against a small per-subspace codebook, and represent every vector by its
  * m code ids — d·4 bytes collapse to m bytes, the memory trick behind
  * billion-vector ANN indexes (FAISS's IVFPQ pairs this with
  * [[SimSearch.ivfTrainedWriteIndex]]'s coarse cells).
  *
  * Codebooks here come from deterministic seed vectors (their subvectors are
  * the codewords — the same engine-reproducible convention as the seeded IVF
  * and Lloyd queries; production would Lloyd-train each subspace with
  * [[Clustering.lloydCentroids]], which composes directly since a codebook is
  * just a (code, subvector) table).
  *
  * Exactness: per-subspace squared L2 folds the 8 dims in array order on both
  * engines; assignment ties break to the smaller code via min-struct; every
  * cross-row mean/sum of distances pools in DECIMAL(18,9) before the final
  * double division.
  *
  * Scale shape: the codebook (m × codes rows) is broadcast; encoding is one
  * scan with a subspace Generate (m rows per vector, each carrying one 8-dim
  * slice, never the full vector twice) and a per-(id, subspace) argmin
  * aggregate. ADC scoring joins the m-rows-per-vector code table to the
  * broadcast query lookup table and sums m terms per id — shuffle carries
  * (id, partial decimal) only.
  */
object ProductQuant {

  /** (id, subspace, sub array<double>) rows: subspace s carries dims
    * [s·subDim+1, (s+1)·subDim]. `m · subDim` must equal the vector length
    * (enforced per row — a short vector raises, never silently truncates).
    */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         m: Int, subDim: Int): DataFrame =
    df.select(col(idCol),
        when(size(col(vecCol)) === m * subDim, col(vecCol))
          .otherwise(raise_error(concat(lit(s"pq: expected ${m * subDim} dims, got "),
            size(col(vecCol))))).as("__v"))
      .select(col(idCol), explode(array((0 until m).map { s =>
        struct(lit(s).as("subspace"),
          slice(col("__v"), s * subDim + 1, subDim).cast("array<double>")
            .as("sub"))
      }: _*)).as("__ss"))
      .select(col(idCol), col("__ss.subspace").as("subspace"),
        col("__ss.sub").as("sub"))

  // native codegen'd loop, bit-equal to the zip_with/aggregate fold —
  // this runs n·m·|codes| times per encode scan, the PQ hot path
  private def sqDist(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.vecSqDist(a, b)

  /** Assign every (vector, subspace) to its nearest codeword. `codebook` is
    * (codeCol, vecCol) seed rows whose subvectors become the per-subspace
    * codewords. Output: (id, subspace, code, sq_err).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebook: DataFrame, codeCol: String, cvecCol: String,
             m: Int = 8, subDim: Int = 8): DataFrame = {
    val v = subvectors(df, idCol, vecCol, m, subDim)
    val c = subvectors(codebook.select(col(codeCol).as("__code"),
        col(cvecCol).as("__cv")), "__code", "__cv", m, subDim)
      .select(col("__code"), col("subspace"), col("sub").as("__csub"))
    v.join(broadcast(c), Seq("subspace"))
      .select(col(idCol), col("subspace"), col("__code"),
        sqDist(col("sub"), col("__csub")).as("__d2"))
      .groupBy(col(idCol), col("subspace"))
      .agg(min(struct(col("__d2"), col("__code"))).as("__b"))
      .select(col(idCol), col("subspace"),
        col("__b.__code").as("code"), col("__b.__d2").as("sq_err"))
  }

  /** Codebook utilization + distortion summary: per (subspace, code) cell,
    * how many vectors landed there and their mean squared quantization error
    * (DECIMAL-pooled). The readout a PQ tuning pass watches: dead codes and
    * high-MSE cells both say "retrain or re-split".
    */
  def codebookSummary(df: DataFrame, idCol: String, vecCol: String,
                      codebook: DataFrame, codeCol: String, cvecCol: String,
                      m: Int = 8, subDim: Int = 8): DataFrame =
    encode(df, idCol, vecCol, codebook, codeCol, cvecCol, m, subDim)
      .groupBy(col("subspace"), col("code"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("sq_err").cast("decimal(18,9)")).cast("double") /
          count(lit(1))).as("mse"))

  /** Asymmetric distance computation (ADC) top-k: the query stays EXACT while
    * the corpus is PQ codes — distance(q, v) ≈ Σ_s ‖q_s − codeword(s,
    * code_s(v))‖², read from an m×codes lookup table built once per query
    * (the paper's Fig. 2 trick: m table lookups per corpus vector, no
    * decode). `queryVec` need not be in the corpus; `excludeId` drops the
    * query's own row. `idCol` must be UNIQUE per vector (it is the
    * encode aggregation key — on duplicate ids the two plan shapes would
    * differ: the scan-side fold scores rows independently while the join
    * path collapses per id). Output: (id, adc_dist), k rows ascending.
    */
  /** Residual vectors against a coarse-quantizer centroid table (cid,
    * cvec `array<double>`): each vector's cosine-argmax cell
    * ([[Clustering.lloydAssign]] — the IVF assignment) and the elementwise
    * difference v − centroid. This is what FAISS's IVFPQ actually encodes —
    * residuals concentrate near zero once the coarse cell soaks up the
    * vector's position, so the same codebook budget buys lower distortion
    * ([[subspaceMse]] quantifies exactly that; OmegaModulesSpec asserts the
    * drop). Output: (id, cid, resid array<double>).
    */
  def residualVectors(df: DataFrame, idCol: String, vecCol: String,
                      cents: DataFrame): DataFrame = {
    val assigned = Clustering.lloydAssign(
      Clustering.lloydPrep(df, idCol, vecCol), idCol, vecCol, cents)
    assigned.select(col(idCol), col("cid"))
      .join(broadcast(cents.select(col("cid"), col("cvec").as("__cv"))),
        Seq("cid"))
      .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), col("cid"),
        zip_with(col(vecCol), col("__cv"),
          (x, c) => x.cast("double") - c).as("resid"))
  }

  /** Pooled per-subspace quantization MSE of an [[encode]] output —
    * DECIMAL-pooled sum of sq_err over all vectors, one row per subspace.
    */
  def subspaceMse(encoded: DataFrame): DataFrame =
    encoded.groupBy(col("subspace"))
      .agg((sum(col("sq_err").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("mse"))

  /** The ADC lookup table for one query: (code, subspace, __dq2) — the
    * per-subspace squared L2 between the EXACT query slice and every
    * codeword. m×codes rows; always broadcast by callers.
    */
  def adcLut(codebook: DataFrame, codeCol: String, cvecCol: String,
             queryVec: Seq[Float], m: Int = 8, subDim: Int = 8): DataFrame = {
    require(queryVec.length == m * subDim,
      s"pq: query has ${queryVec.length} dims, expected ${m * subDim}")
    val q = array(queryVec.map(x => lit(x.toDouble)): _*)
    subvectors(codebook.select(col(codeCol).as("__code"),
        col(cvecCol).as("__cv")), "__code", "__cv", m, subDim)
      .select(col("__code").as("code"), col("subspace"),
        sqDist(slice(q, col("subspace") * subDim + 1, lit(subDim)),
          col("sub")).as("__dq2"))
  }

  /** Pack (id, subspace, code) assignment rows into one `array<int>` of m
    * codes per id, subspace order — the m-bytes-per-vector representation an
    * IVFPQ index persists.
    */
  def packCodes(codes: DataFrame, idCol: String): DataFrame =
    codes.groupBy(col(idCol))
      .agg(transform(sort_array(collect_list(
          struct(col("subspace"), col("code")))),
        s => s.getField("code").cast("int")).as("codes"))

  /** Codebook-size ceiling for [[adcTopK]]'s scan-side literal fold. The
    * fold emits m × |codes| struct literals per projection plus an m-way
    * literal map; past a few dozen codewords that single projection risks
    * Janino's 64 KB method / constant-pool limits (silent interpreted
    * fallback at best, codegen failure at worst). Above the gate adcTopK
    * keeps the same semantics through the broadcast-join shape instead
    * (encode → broadcast LUT join → keyed sum), which is literal-free and
    * sized by data, not by generated code.
    */
  val AdcFoldMaxCodes: Int = 64

  /** True when the codebook is small enough for [[adcTopK]]'s scan-side
    * literal fold. Decided from a LIMIT probe — `limit(n + 1).count()`
    * caps every scan task at n + 1 rows — so the answer never requires
    * materializing the book on the driver (ProductQuantSpec proves the
    * probe consumes a bounded prefix of a 1M-row book via an accumulator).
    */
  private[ext] def foldEligible(codebook: DataFrame): Boolean =
    codebook.limit(AdcFoldMaxCodes + 1).count() <= AdcFoldMaxCodes

  def adcTopK(df: DataFrame, idCol: String, vecCol: String,
              codebook: DataFrame, codeCol: String, cvecCol: String,
              queryVec: Seq[Float], k: Int, excludeId: Long = -1L,
              m: Int = 8, subDim: Int = 8): DataFrame = {
    require(queryVec.length == m * subDim,
      s"pq: query has ${queryVec.length} dims, expected ${m * subDim}")
    // A PQ codebook is small BY CONSTRUCTION (m·codes subvectors — the
    // whole point of the encoding is that it fits anywhere), so collect
    // it once and fold encode + ADC into scan-side expressions: the
    // per-subspace argmin is an array_min over per-codeword literal
    // distances (same (d2, code) lexicographic tie-break as encode's
    // min-struct) and the lookup-table read is an element_at on a literal
    // map. The explode → broadcast-join → two keyed aggregates of the
    // r13 shape collapse to ONE scan plus the global top-k — at sf0.1
    // that halved the query (2 shuffles + 3 scans → 0 shuffles + 1 scan),
    // and at 100 TB the scan-side form is the one that rides the
    // corpus scan like any other projection. The fold is gated on
    // [[AdcFoldMaxCodes]]: a 256-codeword × m=8 book would bake ~2k
    // struct literals into one generated method, so large books take the
    // broadcast-join path below (ProductQuantSpec drives both
    // differentially at 256 codewords and asserts the chosen plan shape).
    // The fold-vs-join decision runs BEFORE any driver materialization:
    // foldEligible counts a LIMIT(AdcFoldMaxCodes + 1) probe, so a misused
    // oversized "codebook" (a 1M-centroid table passed by mistake — the
    // exact case the gate exists for) is never collected just to be
    // counted; only a book proven ≤ AdcFoldMaxCodes rows is pulled to the
    // driver, and that collect is ≤ 64 rows by construction.
    if (!foldEligible(codebook))
      return adcTopKJoin(df, idCol, vecCol, codebook, codeCol, cvecCol,
        queryVec, k, excludeId, m, subDim)
    val cb = codebook
      .select(col(codeCol).cast("long"), col(cvecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cb.nonEmpty, "pq: empty codebook")
    cb.foreach { case (c, v) => require(v.length == m * subDim,
      s"pq: codeword $c has ${v.length} dims, expected ${m * subDim}") }
    val q = queryVec.map(_.toDouble)
    val guarded = when(size(col(vecCol)) === m * subDim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"pq: expected ${m * subDim} dims, got "), size(col(vecCol)))))
    val dist = (0 until m).map { s =>
      val vs = slice(col("__v"), s * subDim + 1, subDim).cast("array<double>")
      val best = array_min(array(cb.map { case (c, cw) =>
        val cws = array(cw.slice(s * subDim, (s + 1) * subDim).map(lit): _*)
        struct(sqDist(vs, cws).as("d2"), lit(c).as("code"))
      }: _*))
      // driver-side LUT value replicates sqDist's left fold exactly:
      // acc + (q_i − c_i)·(q_i − c_i) over the subspace dims in order
      val lut = map(cb.flatMap { case (c, cw) =>
        val dq2 = (s * subDim until (s + 1) * subDim).foldLeft(0.0) {
          (acc, i) => acc + (q(i) - cw(i)) * (q(i) - cw(i))
        }
        Seq(lit(c), lit(dq2))
      }: _*)
      element_at(lut, best.getField("code")).cast("decimal(18,9)")
    }.reduce(_ + _)
    df.select(col(idCol), guarded.as("__v"))
      .filter(col(idCol) =!= excludeId)
      .select(col(idCol), dist.cast("double").as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }

  /** The large-codebook ADC shape: [[encode]]'s explode + broadcast-codebook
    * argmin, then a broadcast join against [[adcLut]]'s m×codes query table
    * and a per-id DECIMAL sum. Two keyed aggregates and one extra scan vs
    * the literal fold, but zero generated-code growth in |codes| — the form
    * that holds at real 256-codeword books. Same tie-break (min-struct on
    * (d2, code)) and same DECIMAL(18,9) pooling, so results are bit-equal
    * to the fold (ProductQuantSpec asserts it differentially).
    */
  private[ext] def adcTopKJoin(df: DataFrame, idCol: String, vecCol: String,
                          codebook: DataFrame, codeCol: String, cvecCol: String,
                          queryVec: Seq[Float], k: Int, excludeId: Long,
                          m: Int, subDim: Int): DataFrame = {
    val lut = adcLut(codebook, codeCol, cvecCol, queryVec, m, subDim)
      .select(col("code").cast("long").as("code"), col("subspace"),
        col("__dq2"))
    encode(df.filter(col(idCol) =!= excludeId), idCol, vecCol,
        codebook, codeCol, cvecCol, m, subDim)
      .select(col(idCol), col("subspace"), col("code").cast("long").as("code"))
      .join(broadcast(lut), Seq("subspace", "code"))
      .groupBy(col(idCol))
      .agg(sum(col("__dq2").cast("decimal(18,9)")).cast("double")
        .as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }
}
