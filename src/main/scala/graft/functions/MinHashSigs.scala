package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused MinHash: `minhash_sigs(text, k, numHashes)` → `array<long>`
  * of the numHashes signature minima over the document's word k-shingles, as
  * one scan-local expression.
  *
  * Why an expression: the dataflow form (shingle explode → md5 hash →
  * groupBy(doc) with numHashes min-aggregates) shuffles the whole shingle
  * stream to come back to one row per document. Min is duplicate-insensitive,
  * so computing over the raw shingle sequence scan-side is bit-identical to
  * the aggregate over DISTINCT shingles
  * ([[graft.ext.Dedup.signaturesFromShingles]], kept as the differential
  * partner and for pre-filtered shingle sets like the stop-shingle cut).
  * Hash family: h_j(x) = (a_j·x + b_j) mod P over the md5-prefix token hash
  * — the constants live HERE ([[MinHashSigs.hashA]]/[[MinHashSigs.hashB]]/
  * [[MinHashSigs.Prime]]) and `Dedup` delegates, so the fused kernel, the
  * aggregate form and the DuckDB oracle can't drift apart.
  */
case class MinHashSigs(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {
  require(k >= 1 && numHashes >= 1,
    s"k ($k) and numHashes ($numHashes) must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[UTF8String], k, numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigs.compute($c, $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  private val SPACE = UTF8String.fromString(" ")

  /** Smallest prime > 2^32 — the universal-hash modulus. */
  val Prime: Long = 4294967311L
  def hashA(j: Int): Long = 2L * j + 3
  def hashB(j: Int): Long = 1000003L * (j + 1)

  /** Static kernel shared by interpreted eval and generated code. Shingling
    * matches [[WordShingles.compute]] exactly (short docs yield one partial
    * shingle); repeats can't change a min, so no dedup pass is needed.
    */
  def compute(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    val count = math.max(n - k + 1, 1)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < count) {
      val end = math.min(i + k, n)
      val sh = UTF8String.concatWs(SPACE,
        java.util.Arrays.copyOfRange(toks, i, end): _*)
      val h = SimHash32.tokenHash32(sh)
      var j = 0
      while (j < numHashes) {
        val v = (hashA(j) * h + hashB(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashSigs(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(text), k, numHashes))
}
