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

  test("simhash32 is callable from SQL and matches the kernel directly") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT simhash32('the quick brown fox') AS s").head()
    val direct = graft.functions.SimHash32.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "the quick brown fox"))
    assert(r.getLong(0) == direct)
    assert(0 <= direct && direct <= 0xffffffffL, "32-bit signature range")
  }
}
