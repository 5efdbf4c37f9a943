package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Breadth-first reachability profiling — "how far is the graph from its
  * busiest hub?": BFS levels from a deterministic seed (the max-degree node,
  * ties by min id) up to a depth cap, reported as a level histogram. The
  * cheap structural fingerprint that catches a co-purchase graph fragmenting
  * (level-0 component shrinks) or collapsing into a hairball (everything at
  * level ≤ 2) between corpus drops.
  *
  * Scale shape: classic distributed frontier expansion — each round is ONE
  * equi-join of the (checkpointed) edge list against the previous frontier
  * plus an anti-join against the visited set, so round r touches only the
  * distance-r frontier; rounds are bounded by `maxDepth`. The visited set is
  * checkpointed per round (the [[Dedup.dupClustersWithStats]] discipline —
  * without it every round would re-run the whole upstream edge pipeline).
  * First discovery IS the minimum distance (BFS invariant), which is exactly
  * the `MIN(d)` the DuckDB recursive-CTE oracle states.
  */
object GraphPaths {

  /** BFS level histogram from the (max-degree, min-id) seed node.
    * Output: (level, n_nodes), level 0 = the seed, rows only for reached
    * levels ≤ maxDepth.
    */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
                maxDepth: Int = 10): DataFrame = {
    require(maxDepth >= 1, s"maxDepth ($maxDepth) must be >= 1")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val both = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(eager = true) // joined once per BFS round
    val seed = both.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node"))
      .limit(1)
    var levels = seed.select(col("node").as("id"), lit(0).as("level"))
      .localCheckpoint(eager = true)
    var d = 1
    var grew = true
    while (grew && d <= maxDepth) {
      val frontier = levels.filter(col("level") === d - 1)
        .select(col("id").as("u"))
      val next = both.join(frontier, Seq("u"))
        .select(col("v").as("id")).distinct()
        .join(levels, Seq("id"), "left_anti")
        .select(col("id"), lit(d).as("level"))
      val grown = levels.union(next).localCheckpoint(eager = true)
      // one cheap narrow-scan count per round — the convergence check
      grew = grown.count() > levels.count()
      levels = grown
      d += 1
    }
    levels.groupBy(col("level")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("level"))
  }
}
