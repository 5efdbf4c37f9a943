package graft.ext

import graft.SparkTestBase

class CommunitiesSpec extends SparkTestBase {
  import spark.implicits._

  test("labelPropagation: two cliques with a weak bridge split into two " +
    "communities labeled by their min node") {
    // triangle {1,2,3} (weight 5) and triangle {10,11,12} (weight 5) joined
    // by a single weight-1 bridge 3-10
    val edges = Seq(
      (1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (10L, 11L, 5L), (10L, 12L, 5L), (11L, 12L, 5L),
      (3L, 10L, 1L)).toDF("src", "dst", "w")
    val out = Communities.labelPropagation(edges, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).map(out) == Set(1L))
    assert(Set(10L, 11L, 12L).map(out) == Set(10L))
  }

  test("labelPropagation: tie weights resolve to the smallest label and a " +
    "single edge converges to the min endpoint") {
    val edges = Seq((7L, 9L, 2L)).toDF("src", "dst", "w")
    val out = Communities.labelPropagation(edges, "src", "dst", "w", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sync LPA oscillates on a bipartite pair: iter 1 swaps the labels
    // ({7→9, 9→7}), iter 2 swaps them back. The FIXED iteration count is what
    // keeps the result well-defined — after an even count each node holds its
    // starting label, deterministically.
    assert(out == Map(7L -> 7L, 9L -> 9L))
  }

  test("labelPropagation: weight majority beats node-id tie-break") {
    // node 5's neighbours: 1 (weight 1) and 9 (weight 10) → adopts 9's label
    // even though 1 < 9
    val edges = Seq((1L, 5L, 1L), (5L, 9L, 10L)).toDF("src", "dst", "w")
    val out = Communities.labelPropagation(edges, "src", "dst", "w", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(5L) == 9L)
  }
}
