package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 batch-17b spec: mutual nearest neighbors. */
class MnnSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDf(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("vec_id", "embedding")

  test("mnn: planted reciprocal pairs are found, hub-dragged ones are not") {
    // A side (even ids), B side (odd ids), 4-dim:
    //  0 <-> 1: near-identical           -> mutual
    //  2 <-> 3: near-identical           -> mutual
    //  4: closest to 1, but 1 prefers 0  -> NOT mutual
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.99f, 0.1f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0.98f, 0.2f, 0f)),
      (4L, Seq(0.9f, 0.2f, 0.1f, 0f))
    )
    val out = SimSearch.mutualNearestNeighbors(mkDf(vecs), "vec_id",
        "embedding", col("vec_id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L), (2L, 3L)), s"got $out")
  }

  test("mnn: exact match with an independent replay on seeded vectors") {
    val rnd = new scala.util.Random(127)
    val vecs = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val out = SimSearch.mutualNearestNeighbors(mkDf(vecs), "vec_id",
        "embedding", col("vec_id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // replay with ascending-index double accumulation + id tie-breaks
    def dot(x: Seq[Float], y: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    def cos(x: Seq[Float], y: Seq[Float]): Double =
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    val a = vecs.filter(_._1 % 2 == 0); val b = vecs.filter(_._1 % 2 == 1)
    def top1(q: (Long, Seq[Float]), side: Seq[(Long, Seq[Float])]): Long =
      side.map(o => (o._1, cos(q._2, o._2)))
        .sortBy { case (id, c) => (-c, id) }.head._1
    val want = (for {
      x <- a
      yId = top1(x, b)
      if top1(b.find(_._1 == yId).get, a) == x._1
    } yield (x._1, yId)).toSet
    assert(out == want)
  }

  test("mnn: pairs are one-to-one (an id appears at most once per side)") {
    val rnd = new scala.util.Random(131)
    val vecs = (0L until 200L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat())))
    val rows = SimSearch.mutualNearestNeighbors(mkDf(vecs), "vec_id",
      "embedding", col("vec_id") % 2 === 0).collect()
    val as = rows.map(_.getLong(0)); val bs = rows.map(_.getLong(1))
    assert(as.distinct.length == as.length)
    assert(bs.distinct.length == bs.length)
    assert(as.forall(_ % 2 == 0) && bs.forall(_ % 2 == 1))
  }
}
