package graft.ext

import graft.SparkTestBase

class CoresetSpec extends SparkTestBase {
  import spark.implicits._

  test("fps picks the geometric extremes in order") {
    // seed +x; c is antipodal (picked first), b orthogonal, a near the seed
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.99f, 0.14f)),   // a: close to seed
      (2L, Seq(0.0f, 1.0f)),     // b: orthogonal
      (3L, Seq(-1.0f, 0.0f))     // c: opposite
    ).toDF("vec_id", "embedding")
    val out = Coreset.farthestPointSample(emb, "vec_id", "embedding",
      seedId = 0L, k = 4).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 3L, 2L, 1L))
    assert(out(0).isNullAt(2))                       // seed has no distance
    assert(approx(out(1).getDouble(2), -1.0, 1e-6))  // cos(c, seed)
    // b's nearest center at pick time is max(cos(b,seed)=0, cos(b,c)=0) = 0
    assert(approx(out(2).getDouble(2), 0.0, 1e-6))
  }

  test("fps matches a local greedy reference on random vectors") {
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 20L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val emb = vecs.toDF("vec_id", "embedding")
    val out = Coreset.farthestPointSample(emb, "vec_id", "embedding",
      seedId = 0L, k = 6).collect().map(_.getLong(1)).toSeq

    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val byId = vecs.toMap
    var selected = Seq(0L)
    while (selected.length < 6) {
      val rest = vecs.filterNot(v => selected.contains(v._1))
      val next = rest.map { case (id, v) =>
        (id, selected.map(s => cos(v, byId(s))).max)
      }.minBy { case (id, bs) => (bs, id) }._1
      selected = selected :+ next
    }
    assert(out == selected)
  }
}
