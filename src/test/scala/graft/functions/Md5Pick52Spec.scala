package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class Md5Pick52Spec extends SparkTestBase {

  test("kernel matches the built-in conv(substring(md5(concat)),16,10) " +
    "chain bit-for-bit over boundary and random ids") {
    import spark.implicits._
    val ids = Seq(
      (0L, 0L), (1L, 2L), (9L, 10L), (99L, 100L),
      (1234567L, 7654321L), (Long.MaxValue, 1L), (1L, Long.MaxValue),
      (Long.MaxValue, Long.MaxValue))
    val rnd = new scala.util.Random(42)
    val all = ids ++ Seq.fill(200)(
      (math.abs(rnd.nextLong() % 1000000007L), math.abs(rnd.nextLong() % 97L)))
    val df = all.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        Md5Pick52.md5Pick52(col("a"), col("b")).as("fused"),
        conv(substring(md5(concat(col("a").cast("string"), lit(":"),
          col("b").cast("string"))), 1, 13), 16, 10).cast("long")
          .as("builtin"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("value is an unsigned 52-bit quantity: non-negative and < 2^52") {
    val vs = Seq((7L, 13L), (0L, 0L), (Long.MaxValue, Long.MaxValue))
      .map { case (a, b) => Md5Pick52.compute(a, b) }
    vs.foreach { v => assert(v >= 0L && v < (1L << 52)) }
  }

  test("negative ids fall back to Long.toString bytes (same digest text)") {
    import spark.implicits._
    val df = Seq((-5L, -9223372036854775808L)).toDF("a", "b")
    val r = df.select(
      Md5Pick52.md5Pick52(col("a"), col("b")).as("fused"),
      conv(substring(md5(concat(col("a").cast("string"), lit(":"),
        col("b").cast("string"))), 1, 13), 16, 10).cast("long").as("builtin"))
      .head()
    assert(r.getLong(0) == r.getLong(1))
  }
}
