package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // query 0 points along +x; 1 and 2 are near-duplicates close to the query;
  // 3 is orthogonal-ish but still positively relevant; 4 is anti-relevant.
  private def emb = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.9f, 0.11f, 0.0f)),
    (3L, Seq(0.3f, 0.0f, 1.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("mmr diversifies: near-duplicate of the first pick is deferred") {
    val out = Mmr.rerank(emb, "vec_id", "embedding", queryId = 0L,
      candidates = 4, k = 3, lambda = 0.5).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // rnk 1 is the pure-relevance argmax (vec 1, cos ≈ .9939 vs vec 2 ≈ .9926)
    assert(out(0).getLong(1) == 1L)
    // vec 2 (cos .993 to the query but .9998 to vec 1) loses rnk 2 to the
    // diverse vec 3: 0.5·rel − 0.5·maxsim = 0.5·0.9926 − 0.5·0.9998 < 0
    // while vec 3 scores 0.5·0.287 − 0.5·(sim to 1, ≈0.25) > that
    assert(out(1).getLong(1) == 3L)
    assert(out(2).getLong(1) == 2L)
  }

  test("k=1 is exactly the relevance top-1 with score λ·rel") {
    val out = Mmr.rerank(emb, "vec_id", "embedding", queryId = 0L,
      candidates = 4, k = 1, lambda = 0.5).collect()
    assert(out.length == 1 && out(0).getLong(1) == 1L)
    assert(approx(out(0).getDouble(3), out(0).getDouble(2) * 0.5, 1e-6))
  }

  test("mmr matches a local greedy reference on random vectors") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 30L).map(i =>
      (i, Seq.fill(6)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Mmr.rerank(df, "vec_id", "embedding", queryId = 0L,
      candidates = 12, k = 5, lambda = 0.5).collect().map(_.getLong(1)).toSeq

    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val byId = vecs.toMap
    val q = byId(0L)
    val cand = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(12)
    var selected = Seq(cand.minBy { case (id, rel) => (-rel, id) }._1)
    while (selected.length < 5) {
      val next = cand.filterNot(c => selected.contains(c._1)).map {
        case (id, rel) =>
          val ms = selected.map(s => cos(byId(id), byId(s))).max
          (id, 0.5 * rel - 0.5 * ms)
      }.minBy { case (id, sc) => (-sc, id) }._1
      selected = selected :+ next
    }
    assert(out == selected)
  }

  test("lambda=1 reduces to pure relevance ranking over the shortlist") {
    val mmr = Mmr.rerank(emb, "vec_id", "embedding", queryId = 0L,
      candidates = 4, k = 4, lambda = 1.0).collect().map(_.getLong(1)).toSeq
    val rel = SimSearch.topKForId(emb, "vec_id", "embedding", 0L, 4)
      .collect().map(_.getLong(0)).toSeq
    assert(mmr == rel)
  }
}
