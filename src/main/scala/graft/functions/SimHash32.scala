package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused SimHash: `simhash32(text)` → the 32-bit Charikar signature of
  * the document's word unigrams with term-frequency weights, as one
  * scan-local expression.
  *
  * Why an expression: the dataflow formulation
  * (explode → groupBy(doc, token) tf → groupBy(doc) with 32 conditional
  * sums) shuffles the whole token stream TWICE just to come back to one row
  * per document. At 100 TB the signature step dominates the dedup pipeline's
  * shuffle volume; fused, it is zero-shuffle — signatures materialize at the
  * parquet scan and only the tiny banding join moves data. Semantics are
  * bit-identical to the aggregate form ([[graft.ext.Dedup.simhashAgg]], the
  * differential partner): token = `split(text, " ")` element, token hash =
  * first 8 md5 hex chars as a long (the [[graft.ext.Dedup.tokenHash32]]
  * convention the DuckDB oracle also states), bit j set iff
  * Σ_tokens tf·(±1 by hash bit j) > 0.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  private val SPACE = UTF8String.fromString(" ")
  private[functions] val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 hex chars of the token bytes as an unsigned 32-bit value in
    * a long — exactly `conv(substring(md5(tok), 1, 8), 16, 10)`.
    */
  def tokenHash32(tok: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(tok.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val toks = text.split(SPACE, -1)
    // tf per distinct token — the aggregate form weights by term frequency
    val tf = new java.util.HashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < toks.length) {
      val c = tf.get(toks(i))
      if (c == null) tf.put(toks(i), Array(1)) else c(0) += 1
      i += 1
    }
    val sums = new Array[Long](32)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = tokenHash32(e.getKey)
      val w = e.getValue()(0).toLong
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) sums(j) += w else sums(j) -= w
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def simhash32(text: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(text)))
}

/** 60-bit widening of [[SimHash32]] for the PAIR-detection path: with 8-bit
  * band keys a corpus of n docs puts ~n/256 docs in every band bucket and
  * the candidate join grows quadratically once buckets saturate (measured:
  * q_simhash_pairs went 23× for 10× data in the r13 sf1.0 probe). 60 bits
  * give 4 bands × 15 bits = 32,768 keys per band — the same
  * hamming ≤ 3 pigeonhole exactness, buckets that stay sparse until ~10M
  * docs per shuffle partition, and a value both engines can state exactly:
  * the first 15 md5 hex chars as a long (`conv(substring(md5(tok), 1, 15),
  * 16, 10)` / `('0x' || substr(md5(tok), 1, 15))::BIGINT` — 60 bits never
  * overflows a signed 64-bit int, which full 16-char md5 would).
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  private val SPACE = UTF8String.fromString(" ")
  val Bits = 60

  /** First 15 md5 hex chars of the token bytes as a 60-bit value —
    * exactly `conv(substring(md5(tok), 1, 15), 16, 10)`: bytes 0-6 whole,
    * plus the high nibble of byte 7.
    */
  def tokenHash60(tok: UTF8String): Long = {
    val md = SimHash32.md5Local.get()
    md.reset()
    val d = md.digest(tok.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Static kernel shared by interpreted eval and generated code — the
    * [[SimHash32.compute]] loop at width 60.
    */
  def compute(text: UTF8String): Long = {
    val toks = text.split(SPACE, -1)
    val tf = new java.util.HashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < toks.length) {
      val c = tf.get(toks(i))
      if (c == null) tf.put(toks(i), Array(1)) else c(0) += 1
      i += 1
    }
    val sums = new Array[Long](Bits)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = tokenHash60(e.getKey)
      val w = e.getValue()(0).toLong
      var j = 0
      while (j < Bits) {
        if (((h >> j) & 1L) == 1L) sums(j) += w else sums(j) -= w
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (sums(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def simhash60(text: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(text)))
}
