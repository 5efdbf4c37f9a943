package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{CharNgrams, FloatVecDot, MinHashSigs, SimHash32, WordChunks, WordPairs, WordShingles}

/** SparkSessionExtensions entry point: make graft's native expressions available as
  * SQL functions. Wire with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` at session build, or
  * call [[GraftExtensions.register]] on a live session.
  *
  * {{{ SELECT float_vec_dot(embedding, other_embedding) FROM t }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => WordShingles(children(0),
        children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("word_pairs"),
      new ExpressionInfo(classOf[WordPairs].getName, "word_pairs"),
      (children: Seq[Expression]) => WordPairs(children(0),
        children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => CharNgrams(children(0),
        children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("word_chunks"),
      new ExpressionInfo(classOf[WordChunks].getName, "word_chunks"),
      (children: Seq[Expression]) => WordChunks(children(0),
        children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => SimHash32(children(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) => MinHashSigs(children(0),
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Int])))
    // scale-lint: flag unpartitioned windows over unbounded children
    // (warn by default; spark.graft.scaleGuard.fail=true -> analysis error)
    ext.injectCheckRule(spark => graft.plans.ScaleGuard.check(spark))
  }
}

object GraftExtensions {
  /** Late registration on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerTempFunction(spark, "float_vec_dot",
      (children: Seq[Expression]) => FloatVecDot(children.head, children(1)))
    ColumnBridge.registerTempFunction(spark, "word_pairs",
      (children: Seq[Expression]) => WordPairs(children.head,
        children(1).eval().asInstanceOf[Int]))
    ColumnBridge.registerTempFunction(spark, "word_shingles",
      (children: Seq[Expression]) => WordShingles(children.head,
        children(1).eval().asInstanceOf[Int]))
    ColumnBridge.registerTempFunction(spark, "char_ngrams",
      (children: Seq[Expression]) => CharNgrams(children.head,
        children(1).eval().asInstanceOf[Int]))
    ColumnBridge.registerTempFunction(spark, "word_chunks",
      (children: Seq[Expression]) => WordChunks(children.head,
        children(1).eval().asInstanceOf[Int]))
    ColumnBridge.registerTempFunction(spark, "simhash32",
      (children: Seq[Expression]) => SimHash32(children.head))
    ColumnBridge.registerTempFunction(spark, "minhash_sigs",
      (children: Seq[Expression]) => MinHashSigs(children.head,
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Int]))
  }
}
