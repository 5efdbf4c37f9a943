package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HilbertXy2dSpec extends SparkTestBase {
  import spark.implicits._

  test("order-1 golden: the four cells in U order") {
    assert(HilbertXy2d.compute(0, 0, 1) == 0L)
    assert(HilbertXy2d.compute(0, 1, 1) == 1L)
    assert(HilbertXy2d.compute(1, 1, 1) == 2L)
    assert(HilbertXy2d.compute(1, 0, 1) == 3L)
  }

  test("order-2 golden probes: first sub-square traversed x-first") {
    assert(HilbertXy2d.compute(0, 0, 2) == 0L)
    assert(HilbertXy2d.compute(1, 0, 2) == 1L)
    assert(HilbertXy2d.compute(1, 1, 2) == 2L)
    assert(HilbertXy2d.compute(0, 1, 2) == 3L)
    assert(HilbertXy2d.compute(3, 0, 2) == 15L) // curve ends at (3, 0)
  }

  test("full 32x32 grid: bijective onto 0..1023 and EVERY consecutive " +
    "step is grid-adjacent (Manhattan distance exactly 1)") {
    val k = 5
    val n = 1 << k
    val byD = new Array[(Long, Long)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = HilbertXy2d.compute(x, y, k)
      assert(d >= 0 && d < n * n && byD(d.toInt) == null,
        s"($x,$y) -> $d collides or overflows")
      byD(d.toInt) = (x.toLong, y.toLong)
    }
    for (d <- 1 until n * n) {
      val (x0, y0) = byD(d - 1)
      val (x1, y1) = byD(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"step $d jumps from ($x0,$y0) to ($x1,$y1)")
    }
  }

  test("codegen path agrees with the static kernel on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        HilbertXy2d.hilbertXy2d(col("x"), col("y"), 8).as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) =>
      assert(d == HilbertXy2d.compute(x, y, 8))
    }
  }

  test("out-of-range coordinates raise instead of aliasing") {
    intercept[IllegalArgumentException](HilbertXy2d.compute(4, 0, 2))
    intercept[IllegalArgumentException](HilbertXy2d.compute(0, -1, 2))
  }
}
