package graft.metrics

import graft.SparkTestBase

class ItemCFSpec extends SparkTestBase {
  import spark.implicits._

  test("itemNeighbors: binary cosine = co / sqrt(ni*nj), both directions ranked") {
    // items 10 and 20 share users {1,2}; n_10 = 3, n_20 = 2
    //   cosine = 2 / sqrt(6); item 30 shares nobody
    val df = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (1L, 20L), (2L, 20L),
      (4L, 30L), (5L, 30L)
    ).toDF("user_id", "item_id")
    val out = ItemCF.itemNeighbors(df, "user_id", "item_id",
        k = 3, minSupport = 2, maxBasket = 50)
      .collect()
      .map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("neighbor_id")) ->
        (r.getAs[Long]("n_both"), r.getAs[Double]("cosine"))).toMap
    val exp = 2.0 / math.sqrt(6.0)
    assert(out.keySet == Set((10L, 20L), (20L, 10L)))
    assert(out((10L, 20L))._1 == 2L)
    assert(approx(out((10L, 20L))._2, math.rint(exp * 1e6) / 1e6, 1e-9))
  }

  test("itemNeighbors: duplicate interactions collapse to binary") {
    val df = Seq(
      (1L, 10L), (1L, 10L), (1L, 10L), (2L, 10L),
      (1L, 20L), (2L, 20L), (2L, 20L)
    ).toDF("user_id", "item_id")
    val out = ItemCF.itemNeighbors(df, "user_id", "item_id",
        k = 3, minSupport = 2, maxBasket = 50).collect()
    // both items held by exactly users {1,2} → cosine 1.0 despite duplicates
    assert(out.forall(_.getAs[Double]("cosine") == 1.0))
  }

  test("itemNeighbors: whale baskets are dropped before the self-join") {
    // user 9 holds every item (basket 4 > cap 3) — without the cap items 1-4
    // would all be pairwise connected through them
    val whale = (1L to 4L).map(i => (9L, i))
    val organic = Seq((1L, 1L), (2L, 1L), (1L, 2L), (2L, 2L))
    val df = (whale ++ organic).toDF("user_id", "item_id")
    val out = ItemCF.itemNeighbors(df, "user_id", "item_id",
        k = 3, minSupport = 2, maxBasket = 3)
      .collect().map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("neighbor_id")))
    assert(out.toSet == Set((1L, 2L), (2L, 1L)))
  }

  test("itemNeighbors: top-k keeps the k best by cosine then neighbor id") {
    // item 1 co-occurs with 2 (strong), 3 (weak), 4 (weak) — k=2 keeps 2 and
    // the id-smaller of the tied weak pair
    val strong = (1L to 6L).flatMap(u => Seq((u, 1L), (u, 2L)))
    val weak3 = Seq((1L, 3L), (7L, 3L))
    val weak4 = Seq((1L, 4L), (8L, 4L))
    val df = (strong ++ weak3 ++ weak4).toDF("user_id", "item_id")
    val out = ItemCF.itemNeighbors(df, "user_id", "item_id",
        k = 2, minSupport = 2, maxBasket = 50)
      .collect().filter(_.getAs[Long]("item_id") == 1L)
      .sortBy(_.getAs[Int]("rnk"))
      .map(_.getAs[Long]("neighbor_id"))
    assert(out.toSeq == Seq(2L, 3L))
  }
}
