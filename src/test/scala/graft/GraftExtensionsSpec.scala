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

  test("non-literal / non-integer size arguments raise AnalysisException " +
    "with the usage string, not a ClassCastException") {
    GraftExtensions.register(spark)
    // a column where an integer literal is required
    val eCol = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_chunks(text, LENGTH(text)) " +
        "FROM VALUES ('a b c') AS t(text)").collect()
    }
    assert(eCol.getMessage.contains("word_chunks(text, size)"), eCol.getMessage)
    // a non-integer literal
    val eStr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sigs('a b c', 'x', 16)").collect()
    }
    assert(eStr.getMessage.contains("minhash_sigs(text, shingle, nSigs)"),
      eStr.getMessage)
    // missing arguments
    val eArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_ngrams('abc')").collect()
    }
    assert(eArity.getMessage.contains("char_ngrams(text, n)"), eArity.getMessage)
    // a LONG literal is fine (widened, not rejected)
    val ok = spark.sql("SELECT word_chunks('a b c d', 2L) AS c").head()
    assert(ok.getSeq[String](0) == Seq("a b", "c d"))
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
