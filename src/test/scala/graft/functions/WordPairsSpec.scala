package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordPairsSpec extends SparkTestBase {
  import spark.implicits._

  test("golden: canonicalized window pairs in generation order") {
    val out = Seq("a b c a").toDF("text")
      .select(WordPairs.pairs(col("text"), 2).as("p"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("a b", "a c", "b c", "a b", "a c"))
  }

  test("differential vs the composable HOF formulation on random text") {
    val rnd = new scala.util.Random(5)
    val docs = (1 to 40).map { _ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => s"t${rnd.nextInt(8)}")
        .mkString(" ")
    }.toDF("text")
    val native = docs
      .select(explode(WordPairs.pairs(col("text"), 5)).as("pair"))
      .groupBy("pair").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hof = docs.select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(w)), i ->
          |  filter(transform(sequence(i, least(i + 5, size(w))), j ->
          |    CASE WHEN j > i THEN concat_ws(' ',
          |      least(element_at(w, i), element_at(w, j)),
          |      greatest(element_at(w, i), element_at(w, j))) END),
          |    p -> p IS NOT NULL)))""".stripMargin)).as("pair"))
      .groupBy("pair").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native == hof)
  }

  test("single token and empty-ish text yield no pairs") {
    val out = Seq("solo", "").toDF("text")
      .select(WordPairs.pairs(col("text"), 5).as("p"))
      .collect().map(_.getSeq[String](0))
    assert(out.forall(_.isEmpty))
  }

  test("registered SQL function word_pairs works") {
    graft.GraftExtensions.register(spark)
    val out = spark.sql("SELECT word_pairs('x y', 1) AS p")
      .collect().head.getSeq[String](0)
    assert(out == Seq("x y"))
  }
}
