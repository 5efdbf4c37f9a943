package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // (name, region, band, salary): region+band are the quasi-ids, salary sensitive
  private def fixture = Seq(
    ("a", "N", 1L, 100.0), ("b", "N", 1L, 100.0), ("c", "N", 1L, 200.0),
    ("d", "N", 2L, 300.0), // singleton class — k-risk
    ("e", "S", 1L, 400.0), ("f", "S", 1L, 400.0), ("g", "S", 1L, 400.0),
    ("h", "S", 1L, 400.0) // size-4 class but ONE salary — l-risk at l=2
  ).toDF("name", "region", "band", "salary")

  test("kAnonymity: class sizes, l-diversity, and both risk flags") {
    val out = Privacy.kAnonymity(fixture,
        Seq(col("region"), col("band")), col("salary"), k = 3, l = 2)
      .orderBy(col("region"), col("band"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("N", 1L, 3L, 2L, false, false), // 3 members, 2 salaries: safe at k=3,l=2
      ("N", 2L, 1L, 1L, true, true),   // singleton: both flags
      ("S", 1L, 4L, 1L, false, true))) // big class, uniform sensitive: l-risk only
  }

  test("kAnonymitySummary: dataset-level k/l and rows at risk") {
    val classes = Privacy.kAnonymity(fixture,
      Seq(col("region"), col("band")), col("salary"), k = 3, l = 2)
    val s = Privacy.kAnonymitySummary(classes).collect().head
    assert(s.getLong(0) == 3L) // n_classes
    assert(s.getLong(1) == 8L) // n_rows
    assert(s.getLong(2) == 1L) // k_anonymity = min class size
    assert(s.getLong(3) == 1L) // l_level = min distinct sensitive
    assert(s.getLong(4) == 1L) // rows in k-at-risk classes
    assert(s.getLong(5) == 5L) // rows in l-at-risk classes (1 + 4)
  }

  test("kAnonymity: single class covering all rows is safe when large enough") {
    val df = (1 to 10).map(i => ("x", i.toDouble)).toDF("qi", "v")
    val out = Privacy.kAnonymity(df, Seq(col("qi")), col("v"), k = 5, l = 3)
      .collect()
    assert(out.length == 1)
    assert(!out.head.getBoolean(3) && !out.head.getBoolean(4))
  }
}
