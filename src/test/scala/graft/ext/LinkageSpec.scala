package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private def people = Seq(
    (1L, "john smith"),
    (2L, "jon smith"),    // dist 1 to john smith
    (3L, "johnny smith"), // dist 2 to john smith, 3 to jon smith
    (4L, "jane doe"),
    (5L, "janet doe"),    // dist 1 to jane doe
    (6L, "alexandrina smith") // same block, but length band excludes vs all
  ).toDF("id", "name")

  test("fuzzyPairs: blocked, banded, verified with oriented ids") {
    val got = Linkage.fuzzyPairs(people, "id", "name", maxDist = 2, lengthBand = 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 2), (4L, 5L, 1)))
  }

  test("fuzzyPairs: cross-block pairs never compared even when close") {
    // "abc x" vs "abc y": dist 1 but different blocks
    val df = Seq((1L, "abc x"), (2L, "abc y")).toDF("id", "name")
    assert(Linkage.fuzzyPairs(df, "id", "name", maxDist = 2).count() == 0)
  }

  test("fuzzyPairs: length band is a lossless Levenshtein lower bound") {
    // band 10 admits the long name; its true distances still exceed maxDist,
    // so widening the band changes nothing for this fixture
    val wide = Linkage.fuzzyPairs(people, "id", "name", maxDist = 2, lengthBand = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(wide == Set((1L, 2L), (1L, 3L), (4L, 5L)))
  }

  test("fuzzyPairs: stopBlockMaxDf drops hot blocks from candidate generation") {
    val capped = Linkage.fuzzyPairs(people, "id", "name", maxDist = 2,
      lengthBand = 3, stopBlockMaxDf = Some(3))
    // the smith block has 4 members -> dropped; doe block (2) survives
    assert(capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet ==
      Set((4L, 5L)))
  }

  test("fuzzyPairsMultiBlock: superset of single-pass; catches block-key edits") {
    // smith/smyth: the edit is IN the last token, so last-token blocking
    // cannot pair them — the first-token pass can
    val df = people.union(Seq((7L, "john smyth")).toDF("id", "name"))
    val single = Linkage.fuzzyPairs(df, "id", "name", maxDist = 2, lengthBand = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val multi = Linkage.fuzzyPairsMultiBlock(df, "id", "name",
        maxDist = 2, lengthBand = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi))
    assert(!single.contains((1L, 7L)) && multi.contains((1L, 7L)))
    // verified pairs carry the same distances as the single-pass operator
    val dists = Linkage.fuzzyPairsMultiBlock(df, "id", "name", 2, 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    assert(dists((1L, 7L)) == 1)
  }

  test("entityClusters: transitive closure merges chains across pairs") {
    // john smith - jon smith - johnny smith chain via dist<=2 links
    val cl = Linkage.entityClusters(people, "id", "name", maxDist = 2, lengthBand = 3)
      .as[(Long, Long)].collect().toMap
    assert(cl(1L) == 1L && cl(2L) == 1L && cl(3L) == 1L)
    assert(cl(4L) == 4L && cl(5L) == 4L)
    assert(!cl.contains(6L)) // singleton: no pair, no row
  }
}
