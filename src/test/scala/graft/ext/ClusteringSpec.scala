package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0f, 1f, 0f)),
    (10L, Array(0.9f, 0.1f, 0f)),   // → centroid 0
    (11L, Array(0.1f, 0.95f, 0f)),  // → centroid 1
    (12L, Array(0.8f, 0.2f, 0f))    // → centroid 0
  ).toDF("vec_id", "embedding")

  private def cents = vecs.filter(col("vec_id") < 2)
    .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  test("assignToCentroids picks the highest-cosine centroid") {
    val out = Clustering.assignToCentroids(vecs, "vec_id", "embedding",
        cents, "cid", "cvec")
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("assignToCentroids: a centroid assigns to itself with cosine 1") {
    val out = Clustering.assignToCentroids(vecs, "vec_id", "embedding",
        cents, "cid", "cvec")
      .filter(col("vec_id") === 0L).collect().head
    assert(out.getLong(1) == 0L)
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-9)
  }

  test("assignToCentroids: zero-norm vector scores 0 and ties to lowest cid") {
    val z = Seq((5L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Clustering.assignToCentroids(z, "vec_id", "embedding",
      cents, "cid", "cvec").collect().head
    assert(out.getLong(1) == 0L)
    assert(out.getDouble(2) == 0.0)
  }

  test("centroidDupPairs: only same-cluster pairs above threshold, a < b") {
    val out = Clustering.centroidDupPairs(vecs, "vec_id", "embedding",
        cents, "cid", "cvec", threshold = 0.9)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cluster 0 = {0, 10, 12}: all pairwise cosines > 0.9; cluster 1 = {1, 11}
    assert(out == Seq((0L, 10L), (0L, 12L), (1L, 11L), (10L, 12L)))
    // cross-cluster near-orthogonal pairs must be absent even though some share
    // no cluster: (0, 11) etc. are not candidates at all
  }

  test("centroidDupPairs matches brute-force within-cluster cosine") {
    val rng = new scala.util.Random(3)
    val big = (0 until 200)
      .map(i => (i.toLong, Array.fill(16)(rng.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val cs = big.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val assigned = Clustering.assignToCentroids(big, "vec_id", "embedding",
      cs, "cid", "cvec").select(col("vec_id"), col("centroid_id"))
    val blocked = Clustering.centroidDupPairs(big, "vec_id", "embedding",
        cs, "cid", "cvec", threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force: all pairs with cosine >= 0.3 AND same assignment
    val asg = assigned.as[(Long, Long)].collect().toMap
    val brute = SimSearch.allPairsCosine(big, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => asg(a) == asg(b) }.toSet
    assert(blocked == brute)
  }

  test("simplifiedSilhouette: tight clusters near 1, straddling point near 0") {
    // centroids along x and y axes; cluster members almost parallel to their
    // centroid -> a ~ 0, b ~ 1 -> s ~ 1. A 45-degree point ties both (a = b)
    // -> s = 0.
    val vecs = Seq(
      (10L, Array(1.0f, 0.01f)), (11L, Array(1.0f, -0.01f)),
      (20L, Array(0.01f, 1.0f)), (21L, Array(-0.01f, 1.0f)),
      (30L, Array(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val out = Clustering.simplifiedSilhouette(vecs, "vec_id", "embedding",
        cents, "cid", "cvec")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("mean_silhouette"))).toMap
    // the 45-degree point tie-breaks to centroid 1 with s = 0, diluting its mean
    val (n1, s1) = out(1L)
    val (n2, s2) = out(2L)
    assert(n1 == 3L && n2 == 2L)
    assert(s2 > 0.98, s"tight cluster should be ~1, got $s2")
    assert(s1 > 0.6 && s1 < 0.7, s"diluted mean should be ~2/3 of ~1, got $s1")
  }

  test("labelNoiseByKnn flags only the mislabeled vector, with the anchor " +
    "majority as its prediction") {
    def near(base: Seq[Float], eps: Float): Seq[Float] =
      base.zipWithIndex.map { case (v, i) => v + eps * (i % 3 - 1) }
    val dirA = Seq(1f, 0f, 0f, 0f); val dirB = Seq(0f, 1f, 0f, 0f)
    val anchors = (
      (0 until 3).map(i => (i.toLong, near(dirA, 0.01f * (i + 1)), 0)) ++
      (3 until 6).map(i => (i.toLong, near(dirB, 0.01f * (i + 1)), 1))
    ).toDF("vec_id", "embedding", "label")
    val vecs = Seq(
      (10L, near(dirA, 0.02f), 0), // correctly labeled
      (11L, near(dirA, 0.03f), 1), // mislabeled: looks like A, tagged B
      (12L, near(dirB, 0.02f), 1)  // correctly labeled
    ).toDF("vec_id", "embedding", "label")
    val out = Clustering.labelNoiseByKnn(vecs, "vec_id", "embedding", "label",
        anchors, "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == Seq((11L, 1, 0, 3L)), s"got ${out.toSeq}")
  }
}
