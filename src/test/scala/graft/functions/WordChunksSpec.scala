package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordChunksSpec extends SparkTestBase {
  import spark.implicits._

  test("golden chunks: exact multiples, short tail, sub-chunk doc, empty") {
    val out = Seq("a b c d", "a b c", "a", "").toDF("text")
      .select(WordChunks.chunks(col("text"), 2).as("c"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b", "c d"))
    assert(out(1) == Seq("a b", "c")) // short tail chunk
    assert(out(2) == Seq("a"))
    assert(out(3) == Seq("")) // split("", " ") = [""] — one empty chunk
  }

  test("differential vs the interpreted HOF formulation on random corpora") {
    val rnd = new scala.util.Random(11)
    val docs = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(20)))
        .map(_ => ('a' + rnd.nextInt(5)).toChar.toString).mkString(" "))
      .toDF("text")
    def toks = split(col("text"), " ")
    val hofChunks = transform(
      sequence(lit(0),
        ceil(size(toks).cast("double") / 3).cast("int") - 1),
      i => array_join(slice(toks, i * 3 + 1, lit(3)), " "))
    val native = docs.select(posexplode(WordChunks.chunks(col("text"), 3)))
      .groupBy("pos", "col").count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val hof = docs.select(posexplode(hofChunks))
      .groupBy("pos", "col").count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(native == hof)
  }

  test("word_chunks is registered as a SQL function and chunks cover the " +
    "token stream exactly") {
    graft.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT word_chunks('x y z w v', 2) AS c").collect().head.getSeq[String](0)
    assert(out == Seq("x y", "z w", "v"))
    // token conservation: joining the chunks reproduces the text
    assert(out.mkString(" ") == "x y z w v")
  }
}
