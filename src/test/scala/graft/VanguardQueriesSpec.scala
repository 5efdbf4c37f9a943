package graft

import java.sql.Timestamp

class VanguardQueriesSpec extends SparkTestBase {
  import spark.implicits._

  test("data contract flags each dirty rule exactly once on a dirty fixture") {
    // the driver corpus is clean (the oracle run is a zero-violations
    // regression) — the rule logic itself needs a dirty fixture
    val tmp = Scratch.register(
      java.nio.file.Files.createTempDirectory("graft_contract").toString)
    Seq(
      (1.0, 0.05, "A", 10.0, Some(new Timestamp(1700000000000L))),
      (0.0, 0.50, "X", -1.0, Option.empty[Timestamp])
    ).toDF("l_quantity", "l_discount", "l_returnflag", "l_extendedprice",
        "l_shipdate")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = VanguardQueries.qDataContract(spark, tmp).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(1) == 2L))
    assert(out.forall(_.getLong(2) == 1L), out.mkString(", "))
  }
}
