package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CharNgramsSpec extends SparkTestBase {
  import spark.implicits._

  test("golden trigrams and short-text partial") {
    val out = Seq("abcde", "ab", "").toDF("text")
      .select(CharNgrams.ngrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("abc", "bcd", "cde"))
    assert(out(1) == Seq("ab"))   // one partial gram, like substr(1, 3)
    assert(out(2) == Seq(""))
  }

  test("differential vs the HOF substr formulation on random text") {
    val rnd = new scala.util.Random(9)
    val docs = (1 to 50).map(_ =>
      (1 to rnd.nextInt(40)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString).toDF("text")
    val native = docs
      .select(explode(CharNgrams.ngrams(col("text"), 3)).as("g"))
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hof = docs
      .select(explode(transform(
        sequence(lit(1), greatest(length(col("text")) - 2, lit(1))),
        i => col("text").substr(i, lit(3)))).as("g"))
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native == hof)
  }

  test("code-point semantics on multi-byte text") {
    val out = Seq("héllo").toDF("text")
      .select(CharNgrams.ngrams(col("text"), 3).as("g"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("hél", "éll", "llo"))
  }
}
