package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for vector pipelines: int8 quantization (the
  * standard 4× storage/bandwidth cut before an ANN index is built) — pure
  * array-expression work, no UDFs, no shuffle beyond the caller's own.
  */
object Embeddings {

  /** Max-abs value of a float-vector column, in double. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization of one element: round(x · 127 / maxAbs), with
    * all-zero vectors mapping to 0 (not NaN). Kept as a scalar building block so
    * the SQL oracle can mirror it token-for-token.
    */
  def quantize(x: Column, mx: Column): Column =
    when(mx === 0.0, lit(0L))
      .otherwise(round(x.cast("double") * 127.0 / mx).cast("long"))

  /** Quantize a whole embedding column to int8 range. Output adds
    * `q: array<long>` and `scale: double` (the per-vector max-abs;
    * dequantize ≈ q · scale / 127).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val mx = maxAbs(col(vecCol))
    df.withColumn("scale", mx)
      .withColumn("q", transform(col(vecCol), x => quantize(x, col("scale"))))
  }

  /** Per-vector quantization summary — the flat (non-array) projection of
    * [[quantizeInt8]] used by the oracle-checked query: element-wise explode,
    * re-aggregated to (sum, min, max) of the quantized values.
    */
  def quantizeStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val mx = maxAbs(col(vecCol))
    df.select(col(idCol), mx.as("mx"), posexplode(col(vecCol)))
      .select(col(idCol), col("mx"), quantize(col("col"), col("mx")).as("qv"))
      .groupBy(col(idCol))
      .agg(round(first(col("mx")), 6).as("scale"),
        sum(col("qv")).as("sum_q"),
        min(col("qv")).as("min_q"),
        max(col("qv")).as("max_q"))
  }
}
