package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("mortonKey: golden bit interleave") {
    // x=0b101 (5), y=0b011 (3) -> z bits x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0
    // z = 1 + 2 + 8 + 16 = 27
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(r == 27L)
  }

  test("mortonKey: monotone on the diagonal and bounded") {
    val df = spark.range(0, 64).select(
      col("id").as("x"), col("id").as("y"))
    val zs = df.select(Layout.mortonKey(col("x"), col("y"), 6).as("z"))
      .orderBy(col("z")).as[Long].collect()
    assert(zs.length == 64 && zs.head == 0L && zs.last < (1L << 12))
    assert(zs.toSet.size == 64) // interleave is injective
  }

  test("zorderAudit: buckets cover tight rectangles") {
    // full 16x16 grid, 4 bits, coarse 4 -> each bucket is a 4x... rectangle:
    // 2^4 z-values per bucket = a 4x4 tile (2 bits of x, 2 bits of y)
    val grid = spark.range(0, 16).select(col("id").as("x"))
      .crossJoin(spark.range(0, 16).select(col("id").as("y")))
    val audit = Layout.zorderAudit(grid, col("x"), col("y"), bits = 4, coarseBits = 4)
      .collect()
    assert(audit.length == 16)
    audit.foreach { r =>
      assert(r.getAs[Long]("n") == 16)
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") == 3)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") == 3)
    }
  }

  test("saltedJoin: output-identical to the plain join, including dup keys") {
    val big = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (1L, "e"))
      .toDF("k", "payload")
    val small = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "attr")
    val salted = Layout.saltedJoin(big, small, Seq("k"), saltFactor = 4)
      .select("k", "payload", "attr").as[(Long, String, String)].collect().sorted
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "attr").as[(Long, String, String)].collect().sorted
    assert(salted.sameElements(plain) && plain.length == 7)
  }
}
