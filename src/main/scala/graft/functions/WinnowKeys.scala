package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused winnowing: `winnow_keys(text, k, w)` → `array<long>` of the
  * document's DISTINCT selected fingerprint keys (ascending), in one
  * scan-local pass — the Schleimer/Wilkerson/Aiken SIGMOD'03 selection that
  * [[graft.ext.Winnowing]] states declaratively.
  *
  * Why an expression: the dataflow form explodes one row per CHARACTER
  * position and then runs two per-doc windows (rolling MIN + ROW_NUMBER) over
  * that stream — at corpus scale the shuffle+sort of the per-char rows ahead
  * of the window is the entire cost. Here the same selection runs inside the
  * scan with a monotonic deque (O(chars) worst case, no rows leave the task),
  * and only the selected keys — expected density 2/(w+1) — survive.
  *
  * Bit-identical contract with the declarative twin (and the DuckDB oracle):
  *  - k-gram hash = [[SimHash32.tokenHash32]] (32-bit md5 prefix) of the
  *    k-char substring at 1-based position p;
  *  - packed key = h·2²⁰ + (2²⁰−1−p), so MIN realizes the paper's
  *    smallest-hash / rightmost-position tie rule;
  *  - only full windows select (positions ≥ w), ties dedupe to one key.
  * A doc shorter than k+w−1 chars has no full window and yields an empty
  * array; docs at or beyond the 2²⁰-char position space raise (the packed
  * key would corrupt silently).
  *
  * Consecutive-run dedup is EXACT dedup here: a window minimum that stops
  * being selected can never be selected again (later keys that dominated it
  * stay in range longer, and out-of-range keys never return), so each
  * distinct key forms one consecutive selected run.
  */
case class WinnowKeys(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_keys"

  override def nullSafeEval(input: Any): Any =
    WinnowKeys.compute(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowKeys.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
}

object WinnowKeys {

  /** Position space for the packed key — matches
    * [[graft.ext.Winnowing]]'s PosSpace and the oracle literal 1048576.
    */
  val PosSpace: Long = 1L << 20

  /** Static kernel shared by interpreted eval and generated code.
    *
    * The k-gram hash feeds md5 the BYTE SLICE of the k-char substring
    * directly: char→byte offsets are computed once per doc (O(bytes)), so
    * the whole kernel is O(chars) — `substringSQL(p, k)` per position would
    * re-seek from the string start each call (O(chars²) on multi-byte text)
    * and allocate a UTF8String per k-gram. md5 over the slice is
    * byte-identical to md5 over the substring's own bytes.
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val len = text.numChars()
    if (len >= PosSpace)
      throw new IllegalArgumentException(
        s"winnowing position space exceeded: doc length $len")
    val count = len - k + 1 // k-grams at 1-based positions 1..count
    if (count < w) return new GenericArrayData(Array.emptyLongArray)
    val bytes = text.getBytes
    // byte offset of each 0-based char index; offs(len) = total bytes
    val offs = new Array[Int](len + 1)
    var ci = 0
    var bi = 0
    while (ci < len) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(len) = bytes.length
    val md = SimHash32.md5Local.get()
    // monotonic deque of (position, key), keys strictly increasing from the
    // front; front is the current window minimum
    val dqPos = new Array[Int](count)
    val dqKey = new Array[Long](count)
    var head = 0
    var tail = 0 // exclusive
    var out = new Array[Long](math.max(4, 2 * count / (w + 1)))
    var nOut = 0
    var last = Long.MinValue
    var p = 1
    while (p <= count) {
      md.reset()
      md.update(bytes, offs(p - 1), offs(p - 1 + k) - offs(p - 1))
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val key = h * PosSpace + (PosSpace - 1 - p)
      // later position + smaller-or-equal key dominates (keys are unique, so
      // strict > suffices, but >= is the safe statement of the rule)
      while (tail > head && dqKey(tail - 1) >= key) tail -= 1
      dqPos(tail) = p; dqKey(tail) = key; tail += 1
      if (dqPos(head) <= p - w) head += 1
      if (p >= w) {
        val sel = dqKey(head)
        if (sel != last) {
          if (nOut == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
          out(nOut) = sel; nOut += 1; last = sel
        }
      }
      p += 1
    }
    val arr = java.util.Arrays.copyOf(out, nOut)
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  def winnowKeys(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowKeys(ColumnBridge.expression(text), k, w))
}
