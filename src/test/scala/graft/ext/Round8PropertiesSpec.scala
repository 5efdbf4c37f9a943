package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-8 operators — invariants that hold for
  * EVERY input, checked on generated data with fixed seeds (deterministic
  * suite, same convention as MetricPropertiesSpec / GraphFunnelPropertiesSpec).
  */
class Round8PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // --- incrementalRollup: merge ≡ recompute for ANY base/delta partition ----

  private val factsGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.oneOf("k1", "k2", "k3", "k4", "k5"), Gen.choose(0L, 10000L)))
  } yield rows

  test("incrementalRollup: any split of the facts into base and delta " +
    "merges to the full recompute") {
    (1 to 6).foreach { seed =>
      val facts = sample(factsGen, seed)
      val cut = sample(Gen.choose(0, facts.length), seed + 100)
      def agg(rows: Seq[(String, Long)]) = rows.toDF("k", "raw")
        .select(col("k"), col("raw").cast("decimal(38,0)").as("vm"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("vm")).as("s"))
      val delta = facts.drop(cut).toDF("k", "raw")
        .select(col("k"), col("raw").cast("decimal(38,0)").as("vm"))
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2).longValueExact())).toMap
      val merged = toMap(
        Compaction.incrementalRollup(agg(facts.take(cut)), delta, Seq("k"), "vm"))
      assert(merged == toMap(agg(facts)), s"seed $seed cut $cut")
    }
  }

  // --- chunkBoilerplate: token conservation and bounded fractions -----------

  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      grp <- Gen.oneOf("g1", "g2")
      len <- Gen.choose(1, 15)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield (grp, toks.mkString(" ")))
  } yield rows.zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }

  test("chunkBoilerplate: every doc appears once, token counts are " +
    "conserved, fractions live in [0,1]") {
    (1 to 5).foreach { seed =>
      val rows = sample(corpusGen, seed)
      val out = Boilerplate.chunkBoilerplate(
          rows.toDF("doc_id", "grp", "text"), "grp", "doc_id", "text",
          chunkTokens = 3, minDocFrac = 0.4)
        .collect()
      assert(out.map(_.getLong(0)).toSet == rows.map(_._1).toSet, s"seed $seed")
      val tokCount = rows.map(r => r._1 -> r._3.split(" ").length.toLong).toMap
      out.foreach { r =>
        assert(r.getLong(4) == tokCount(r.getLong(0)),
          s"seed $seed doc ${r.getLong(0)}: tokens")
        val frac = r.getDouble(5)
        assert(frac >= 0.0 && frac <= 1.0)
        assert(r.getLong(3) <= r.getLong(2)) // boiler chunks <= chunks
      }
    }
  }

  // --- quantileNormalize: values come from the pool, groups keep their size -

  private val qnGen: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(3, 60)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.oneOf("s1", "s2", "s3"), Gen.choose(0L, 500L)))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }

  test("quantileNormalize: normalized values are pooled order statistics, " +
    "every row survives, extremes map to pooled extremes") {
    (1 to 5).foreach { seed =>
      val rows = sample(qnGen, seed)
      val out = Mixing.quantileNormalize(
          rows.toDF("src", "id", "v"), "src", "v", "id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      assert(out.length == rows.length, s"seed $seed: row count")
      val pool = rows.map(_._3).toSet
      assert(out.forall(r => pool.contains(r._4)), s"seed $seed: membership")
      val (minV, maxV) = (rows.map(_._3).min, rows.map(_._3).max)
      out.groupBy(_._2).foreach { case (g, rs) =>
        if (rs.length > 1) {
          // each multi-row group's smallest value maps to the pooled min and
          // its largest to the pooled max (rank 1 → index 1, rank n → index N)
          val sorted = rs.sortBy(r => (r._3, r._1))
          assert(sorted.head._4 == minV, s"seed $seed group $g min")
          assert(sorted.last._4 == maxV, s"seed $seed group $g max")
        }
      }
    }
  }
}
