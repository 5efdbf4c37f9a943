package graft

import graft.SparkTestBase

class GraftExtensionsSpec extends SparkTestBase {

  test("float_vec_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT float_vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").head()
    assert(approx(r.getDouble(0), 11.0))
  }

  test("type mismatch is an analysis error, not a runtime crash") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT float_vec_dot(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("float") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
