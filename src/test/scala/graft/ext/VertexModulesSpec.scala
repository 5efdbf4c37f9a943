package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 module specs: KMV set-operation sketches and the AMS F2
  * self-join-size estimator.
  */
class VertexModulesSpec extends SparkTestBase {
  import spark.implicits._

  private def md5h32(s: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)

  // --------------------------------------------------------------------------
  // KMV
  // --------------------------------------------------------------------------

  test("kmv: exact tags and independent replay on a small universe") {
    // A = 0..39, B = 20..59: overlap 20, only-A 20, only-B 20; k = 16
    val a = (0 until 40).map(i => s"k$i").toDF("key")
    val b = (20 until 60).map(i => s"k$i").toDF("key")
    val row = Kmv.setOpsAudit(a, b, "key", k = 16).collect().head
    assert(row.getLong(7) == 20L && row.getLong(8) == 20L &&
      row.getLong(9) == 20L) // true_intersect / only_a / only_b
    // independent replay of the whole estimator in plain Scala
    def sk(keys: Seq[String]) =
      keys.map(x => (md5h32(x), x)).sorted.take(16)
    val sa = sk((0 until 40).map(i => s"k$i"))
    val sb = sk((20 until 60).map(i => s"k$i"))
    val u = (sa ++ sb).distinct.sorted.take(16)
    def dv(s: Seq[(Long, String)]) =
      (s.size - 1).toDouble / (s.last._1.toDouble / 4294967296.0)
    val cBoth = u.count(e => sa.contains(e) && sb.contains(e))
    val estI = math.rint(cBoth.toDouble / u.size * dv(u) * 1e6) / 1e6
    assert(row.getDouble(1) == math.rint(dv(sa) * 1e6) / 1e6, "est_a replay")
    assert(row.getDouble(4) == estI, s"est_intersect ${row.getDouble(4)} vs $estI")
  }

  test("kmv: estimates land near truth on disjoint-ish and nested sets") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 3000).map(_ => rnd.nextLong().toString).distinct
    val a = base.take(2000).toDF("key")
    val b = (base.slice(1000, 2000) ++ base.slice(2000, 3000)).toDF("key")
    val r = Kmv.setOpsAudit(a, b, "key", k = 128).collect().head
    val estU = r.getDouble(3)
    val trueU = base.take(3000).length.toDouble // ≈ 3000 distinct
    assert(math.abs(estU - trueU) / trueU < 0.25, s"union est $estU vs $trueU")
    val estI = r.getDouble(4)
    assert(math.abs(estI - 1000.0) / 1000.0 < 0.45, s"intersect est $estI")
    // the exact counts: 1000 shared, 1000 only-A, 1000 only-B
    assert(r.getLong(7) == 1000L && r.getLong(8) == 1000L && r.getLong(9) == 1000L)
  }

  test("kmv: a side below k rows raises loudly instead of estimating") {
    val a = (0 until 10).map(i => s"x$i").toDF("key")
    val b = (0 until 40).map(i => s"x$i").toDF("key")
    val ex = intercept[Exception] {
      Kmv.setOpsAudit(a, b, "key", k = 16).collect()
    }
    assert(ex.getMessage.contains("kmv"), ex.getMessage)
  }

  // --------------------------------------------------------------------------
  // AMS F2
  // --------------------------------------------------------------------------

  test("ams f2: exact moment on a hand-computed fixture") {
    // counts: a=3, b=2, c=1 → F2 = 9 + 4 + 1 = 14
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("item")
    val r = Sketches.selfJoinSizeAudit(df, "item", depth = 5, width = 64)
      .collect().head
    assert(r.getLong(2) == 14L)
    // with 3 singleton-ish items collisions are rare: estimate is a sum of
    // ±products — its magnitude stays within a few times F2
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 14L * 4)
  }

  test("ams f2: the sign-sketch median lands within ~3 sigma on a uniform " +
      "corpus where a CMS inner product would be off by orders of magnitude") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).flatMap { i =>
      Seq.fill(1 + rnd.nextInt(3))(s"u$i")
    }
    val df = rows.toDF("item")
    val f2 = rows.groupBy(identity).map { case (_, g) =>
      g.size.toLong * g.size
    }.sum
    val r = Sketches.selfJoinSizeAudit(df, "item", depth = 5, width = 64)
      .collect().head
    assert(r.getLong(2) == f2)
    // variance per row ≈ 2 F2²/w → sigma ≈ 0.18 F2; median of 5 tightens
    assert(math.abs(r.getDouble(4)) < 0.5,
      s"rel_err ${r.getDouble(4)} too large for an unbiased sign sketch")
  }

  test("ams f2: even depth is rejected (median needs an odd panel)") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException] {
      Sketches.selfJoinSizeAudit(df, "item", depth = 4, width = 64)
    }
  }
}
