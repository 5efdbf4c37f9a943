package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{CharNgrams, MinHashSigs, SimHash32, VecDot, WinnowKeys, WordChunks, WordPairs, WordShingles}

/** SparkSessionExtensions entry point: make graft's native expressions available as
  * SQL functions. Wire with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` at session build, or
  * call [[GraftExtensions.register]] on a live session.
  *
  * {{{ SELECT float_vec_dot(embedding, other_embedding) FROM t }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.intArg

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "float_vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => WordShingles(children(0),
        intArg("word_shingles(text, n)", children, 1))))
    ext.injectFunction((
      FunctionIdentifier("word_pairs"),
      new ExpressionInfo(classOf[WordPairs].getName, "word_pairs"),
      (children: Seq[Expression]) => WordPairs(children(0),
        intArg("word_pairs(text, window)", children, 1))))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => CharNgrams(children(0),
        intArg("char_ngrams(text, n)", children, 1))))
    ext.injectFunction((
      FunctionIdentifier("word_chunks"),
      new ExpressionInfo(classOf[WordChunks].getName, "word_chunks"),
      (children: Seq[Expression]) => WordChunks(children(0),
        intArg("word_chunks(text, size)", children, 1))))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => SimHash32(children(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) => MinHashSigs(children(0),
        intArg("minhash_sigs(text, shingle, nSigs)", children, 1),
        intArg("minhash_sigs(text, shingle, nSigs)", children, 2))))
    ext.injectFunction((
      FunctionIdentifier("winnow_keys"),
      new ExpressionInfo(classOf[WinnowKeys].getName, "winnow_keys"),
      (children: Seq[Expression]) => WinnowKeys(children(0),
        intArg("winnow_keys(text, k, w)", children, 1),
        intArg("winnow_keys(text, k, w)", children, 2))))
    // scale-lint: flag unpartitioned windows over unbounded children
    // (warn by default; spark.graft.scaleGuard.fail=true -> analysis error)
    ext.injectCheckRule(spark => graft.plans.ScaleGuard.check(spark))
    // stream-state lint: flag keyed streaming state with no eviction bound
    // (warn by default; spark.graft.streamGuard.fail=true -> analysis error)
    ext.injectCheckRule(spark => graft.plans.StreamStateGuard.check(spark))
  }
}

object GraftExtensions {

  /** Extract integer argument `pos` of a SQL function call, rejecting
    * anything that is not a foldable integral literal with an
    * `AnalysisException` carrying the usage string — a column or a
    * non-integer literal would otherwise surface as a raw
    * ClassCastException/NPE from `eval().asInstanceOf[Int]` at registration.
    */
  private[graft] def intArg(usage: String, children: Seq[Expression],
                            pos: Int): Int = {
    if (children.size <= pos)
      ColumnBridge.analysisError(
        s"$usage: expects at least ${pos + 1} arguments, got ${children.size}")
    val e = children(pos)
    if (!e.foldable)
      ColumnBridge.analysisError(
        s"$usage: argument ${pos + 1} must be an integer literal, " +
          s"not a column expression (${e.sql})")
    e.eval() match {
      case i: Int => i
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case null => ColumnBridge.analysisError(
        s"$usage: argument ${pos + 1} must be an integer literal, got NULL")
      case other => ColumnBridge.analysisError(
        s"$usage: argument ${pos + 1} must be an integer literal, " +
          s"got ${other.getClass.getSimpleName} '$other'")
    }
  }

  /** Late registration on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerTempFunction(spark, "float_vec_dot",
      (children: Seq[Expression]) => VecDot(children.head, children(1)))
    ColumnBridge.registerTempFunction(spark, "word_pairs",
      (children: Seq[Expression]) => WordPairs(children.head,
        intArg("word_pairs(text, window)", children, 1)))
    ColumnBridge.registerTempFunction(spark, "word_shingles",
      (children: Seq[Expression]) => WordShingles(children.head,
        intArg("word_shingles(text, n)", children, 1)))
    ColumnBridge.registerTempFunction(spark, "char_ngrams",
      (children: Seq[Expression]) => CharNgrams(children.head,
        intArg("char_ngrams(text, n)", children, 1)))
    ColumnBridge.registerTempFunction(spark, "word_chunks",
      (children: Seq[Expression]) => WordChunks(children.head,
        intArg("word_chunks(text, size)", children, 1)))
    ColumnBridge.registerTempFunction(spark, "simhash32",
      (children: Seq[Expression]) => SimHash32(children.head))
    ColumnBridge.registerTempFunction(spark, "minhash_sigs",
      (children: Seq[Expression]) => MinHashSigs(children.head,
        intArg("minhash_sigs(text, shingle, nSigs)", children, 1),
        intArg("minhash_sigs(text, shingle, nSigs)", children, 2)))
    ColumnBridge.registerTempFunction(spark, "winnow_keys",
      (children: Seq[Expression]) => WinnowKeys(children.head,
        intArg("winnow_keys(text, k, w)", children, 1),
        intArg("winnow_keys(text, k, w)", children, 2)))
  }
}
