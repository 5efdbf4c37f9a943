package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a HASH-SEEDED sign matrix
  * (Achlioptas, JCSS'03: ±1 entries preserve pairwise distances in
  * expectation like Gaussian entries do) — the dimensionality-reduction
  * step a 100 TB embedding store runs before an ANN index when 64 floats
  * per row is 4× too many. The matrix entry R[i][j] is the parity of the
  * repo's standard 32-bit md5 hash of "jl:i:j", so NO matrix is stored or
  * shipped: both engines (and any future reader) regenerate the identical
  * matrix from the tag string alone.
  *
  * Exactness: y_i folds Σ_j ±x_j in ascending-j order inside one HOF
  * (deterministic double order, the subspace-distance discipline of
  * [[ProductQuant]]), then divides by √outDims once; IEEE sqrt is
  * correctly rounded, so the scalar is bit-identical across engines.
  *
  * Scale shape: projection is scan-local (a per-row expression — no join
  * against a matrix table, no shuffle); the distortion audit samples pairs
  * by id-hash filters and crossJoins two sampled sides, each hard-capped
  * at [[MaxSide]] rows (the id-hash filter alone only scales the side by
  * 1/mod, which is not a bound at 100 TB).
  */
object RandomProjection {

  private def sign(i: Column, j: Column): Column =
    when(conv(substring(md5(concat(lit("jl:"), i.cast("string"), lit(":"),
      j.cast("string"))), 1, 8), 16, 10).cast("long") % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** Projected vector column: y[i] = (Σ_j sign(i,j)·x[j]) / √outDims,
    * i in 0..outDims-1, j 1-based over the input vector. */
  def jlVector(vec: Column, inDims: Int, outDims: Int): Column =
    transform(sequence(lit(0), lit(outDims - 1)), i =>
      aggregate(sequence(lit(1), lit(inDims)), lit(0.0),
        (acc, j) => acc + element_at(vec, j).cast("double") * sign(i, j))
        / lit(math.sqrt(outDims.toDouble)))

  /** Squared euclidean distance between two equal-length vector columns,
    * folded in ascending index order (deterministic doubles) — the native
    * codegen'd loop, bit-equal to the zip_with/aggregate form. */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecSqDist(a, b)

  /** JL distortion audit: project, sample pairs (ids ≡ 0 mod `modA` ×
    * ids ≡ 0 mod `modB`, a < b), and histogram the squared-distance ratio
    * d²_proj / d²_orig in 0.1-wide buckets. Output per bucket: (bucket,
    * n_pairs, mean_ratio) — the JL lemma says mass concentrates at bucket
    * 10 (ratio ≈ 1); how wide the spill is tells whether `outDims` is
    * enough before committing the reduced store.
    */
  /** Hard cap on each sampled side of the distortion pair join. The id-hash
    * filters alone shrink each side only by a FIXED fraction (1/modA,
    * 1/modB), which still grows linearly with the corpus — at 100 TB the
    * broadcast side would not fit, and pair count grows QUADRATICALLY in
    * the window before any cap binds (the r14 sf1.0 probe measured the
    * old 4096 cap letting the query go 20× for 10× data: the cap only
    * bound beyond ~120k vectors). A distortion audit needs a fixed PAIR
    * budget, not a fixed fraction: each side is the `MaxSide` smallest
    * sampled ids (a deterministic sorted TakeOrdered, so the audit is
    * reproducible), giving ≤ MaxSide²/2 ≈ 33k pairs — ample statistics
    * for a 0.1-wide ratio histogram — and a ≤ MaxSide-row broadcast
    * regardless of corpus size. At the oracle tiers (sides ≈ 7 / 69) the
    * cap never binds.
    */
  val MaxSide: Int = 256

  def distortionHistogram(emb: DataFrame, idCol: String, vecCol: String,
                          inDims: Int, outDims: Int,
                          modA: Int, modB: Int): DataFrame = {
    val proj = emb.select(col(idCol).as("id"), col(vecCol).as("x"),
      jlVector(col(vecCol), inDims, outDims).as("y"))
    val a = proj.filter(col("id") % modA === 0)
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"))
      .orderBy(col("ida")).limit(MaxSide)
    val b = proj.filter(col("id") % modB === 0)
      .select(col("id").as("idb"), col("x").as("xb"), col("y").as("yb"))
      .orderBy(col("idb")).limit(MaxSide)
    a.crossJoin(broadcast(b)).filter(col("ida") < col("idb"))
      .select(sqDist(col("xa"), col("xb")).as("dx2"),
        sqDist(col("ya"), col("yb")).as("dy2"))
      .filter(col("dx2") > 0) // identical originals would ratio 0/0
      .select((col("dy2") / col("dx2")).as("ratio"))
      .groupBy(floor(col("ratio") * 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("ratio").cast("decimal(18,9)")).cast("double") /
          count(lit(1))).as("mean_ratio"))
  }
}
