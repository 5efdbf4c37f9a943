package graft.metrics

import graft.SparkTestBase

class IntraListSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed within-group cosine") {
    // group 1: items A=(1,0), B=(1,0) → cos=1; with C=(0,1): cos(A,C)=cos(B,C)=0
    // ILS = (1+0+0)/3
    val df = Seq(
      (1, "A", "f1", 1.0), (1, "B", "f1", 1.0), (1, "C", "f2", 1.0),
      (2, "A", "f1", 2.0), (2, "B", "f1", 3.0) // cos=1 → ILS=1
    ).toDF("g", "item", "feat", "v")
    val out = IntraList.intraListSimilarity(df, "g", "item", "feat", "v")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1)._1 == 3 && approx(out(1)._2, 1.0 / 3))
    assert(out(2)._1 == 2 && approx(out(2)._2, 1.0))
  }

  test("duplicate (item, feature) cells are averaged (pandas pivot_table mean)") {
    // item A feature f1 appears twice (2.0, 4.0) → 3.0; B=(3,0) → cos(A,B)=1
    val df = Seq(
      (1, "A", "f1", 2.0), (1, "A", "f1", 4.0), (1, "B", "f1", 3.0)
    ).toDF("g", "item", "feat", "v")
    val out = IntraList.intraListSimilarity(df, "g", "item", "feat", "v").collect()
    assert(out.length == 1 && approx(out.head.getDouble(2), 1.0))
  }

  test("groups with one item are excluded; zero-overlap pairs count as 0") {
    val df = Seq(
      (1, "A", "f1", 1.0),                    // single item → excluded
      (2, "A", "f1", 1.0), (2, "B", "f2", 1.0) // disjoint features → ILS 0
    ).toDF("g", "item", "feat", "v")
    val out = IntraList.intraListSimilarity(df, "g", "item", "feat", "v").collect()
    assert(out.length == 1 && out.head.getInt(0) == 2 && approx(out.head.getDouble(2), 0.0))
  }

  test("global ILS is the mean of per-group values") {
    val df = Seq(
      (1, "A", "f1", 1.0), (1, "B", "f1", 1.0),
      (2, "A", "f1", 1.0), (2, "B", "f2", 1.0)
    ).toDF("g", "item", "feat", "v")
    assert(approx(IntraList.globalIls(df, "g", "item", "feat", "v"), 0.5))
  }
}
