package graft.ext

import graft.SparkTestBase

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("skyline2d: hand-built frontier — dominated rows drop, ties survive") {
    // minimize x, maximize y. Frontier: (1,5), (3,9). Dominated: (2,4) by
    // (1,5); (4,9) by (3,9) (same y, larger x); (3,7) by (3,9) (same x,
    // smaller y). Duplicate frontier point (1,5) kept twice.
    val df = Seq(
      (1, 1.0, 5.0), (2, 1.0, 5.0), (3, 2.0, 4.0), (4, 3.0, 9.0),
      (5, 4.0, 9.0), (6, 3.0, 7.0)).toDF("id", "x", "y")
    val out = Skyline.skyline2d(df, "x", "y").collect()
      .map(_.getInt(0)).toSet
    assert(out == Set(1, 2, 4))
  }

  test("skyline2d: differential vs brute-force NOT EXISTS on random data") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map(i =>
      (i, (rnd.nextInt(50) / 2.0), rnd.nextInt(40).toDouble))
    val df = rows.toDF("id", "x", "y")
    val fast = Skyline.skyline2d(df, "x", "y", buckets = 8).collect()
      .map(_.getInt(0)).toSet
    val brute = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.map(_._1).toSet
    assert(fast == brute)
  }

  test("skyline2d: single row and constant columns are their own frontier") {
    val one = Seq((1, 2.0, 3.0)).toDF("id", "x", "y")
    assert(Skyline.skyline2d(one, "x", "y").collect().map(_.getInt(0)).toSeq
      == Seq(1))
    val const = Seq((1, 5.0, 7.0), (2, 5.0, 7.0), (3, 5.0, 7.0))
      .toDF("id", "x", "y")
    assert(Skyline.skyline2d(const, "x", "y").collect().length == 3)
  }
}
