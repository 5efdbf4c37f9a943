package graft.metrics

import graft.SparkTestBase

class NoveltySpec extends SparkTestBase {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("hand-computed msi matches (notebook cell 64 shape)") {
    // popularity: a→8, b→3, c→1 from sales; u := 10 (explicit override)
    val sales = (Seq.fill(8)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map { case (item, idx) => (100 + idx, item) }
      .toDF("person", "product")
    val recs = Seq((1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"))
      .toDF("person", "product")
    val out = Novelty.perUserMsi(sales, recs, u = Some(10L)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val msi1 = (-log2(8.0 / 10) - log2(3.0 / 10) - log2(1.0 / 10)) / 3
    val msi2 = (-log2(8.0 / 10) - log2(3.0 / 10)) / 2
    assert(approx(out(1), msi1), s"user1 ${out(1)} vs $msi1")
    assert(approx(out(2), msi2), s"user2 ${out(2)} vs $msi2")
  }

  test("u defaults to distinct users in sales (§2.4.9)") {
    val sales = Seq((1, "a"), (1, "b"), (2, "a"), (3, "a")).toDF("person", "product")
    val recs = Seq((9, "b")).toDF("person", "product")
    val (mean, perUser) = Novelty.novelty(sales, recs)
    // pop(b)=1, u=3 → msi = -log2(1/3)
    assert(approx(mean, -log2(1.0 / 3)))
    assert(perUser.size == 1 && approx(perUser.head, -log2(1.0 / 3)))
  }

  test("left-join null deflation: unknown items count in denominator (§2.4.2)") {
    val sales = Seq((1, "a"), (2, "a")).toDF("person", "product") // u=2, pop(a)=2
    val recs = Seq((7, "a"), (7, "zzz")).toDF("person", "product") // zzz not in sales
    val out = Novelty.perUserMsi(sales, recs).collect()
    // log2 for 'a' = -log2(2/2) = 0; zzz → null; msi = (0)/2 = 0, NOT 0/1
    assert(out.length == 1 && approx(out.head.getDouble(1), 0.0))

    val sales2 = Seq((1, "a"), (2, "b")).toDF("person", "product") // pop(a)=1, u=2
    val recs2 = Seq((7, "a"), (7, "zzz")).toDF("person", "product")
    val out2 = Novelty.perUserMsi(sales2, recs2).collect()
    // msi = (-log2(1/2) + null)/2 = 1.0/2 = 0.5 — deflated, reference semantics
    assert(approx(out2.head.getDouble(1), 0.5), s"got ${out2.head.getDouble(1)}")
  }

  test("noveltyRefac divides by constant n and throws on unknown items (§2.4.3)") {
    val freqs = Map("a" -> 8L, "b" -> 3L, "c" -> 1L)
    val (_, perUser) = Novelty.noveltyRefac(Seq(Seq("a", "b")), freqs, u = 10L, n = 3)
    val expected = (-log2(8.0 / 10) - log2(3.0 / 10)) / 3 // ÷3 although list has 2
    assert(approx(perUser.head, expected))
    intercept[NoSuchElementException] {
      Novelty.noveltyRefac(Seq(Seq("nope")), freqs, u = 10L, n = 1)
    }
  }
}
