package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal independent set by Luby's algorithm (Luby, "A simple parallel
  * algorithm for the maximal independent set problem", SIAM J. Comput.
  * 1986) — the canonical symmetry-breaking primitive: pick a set of
  * mutually non-adjacent nodes such that every other node touches one.
  * Used for conflict-free scheduling, canonical-representative election in
  * dedup graphs, and as the inner step of distributed coloring.
  *
  * Luby's rounds need RANDOM priorities; here they are md5-derived —
  * `prio(v) = md5_32(v) · 2³¹ + v` (unique: the id tie-break) — so every
  * round is reproducible with no RNG state and no partition-order
  * sensitivity. A node enters the MIS when its priority beats every ACTIVE
  * neighbor's; the node and its neighbors then leave the active set. Each
  * round's expected kill fraction makes O(log n) rounds enough; a fixed
  * round budget leaves stragglers explicitly `undecided`.
  *
  * Scale shape: per round, two semi-joins restrict edges to the active
  * subgraph, one src-keyed min-aggregate finds each node's best active
  * neighbor, and the new MIS/dominated sets are checkpointed (each is
  * referenced twice — accumulator + active-set subtraction — so an
  * unchecked lineage would double per round). Priorities are pure
  * expressions of the node id — no priority table, no extra join.
  */
object Mis {

  private def prio(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") *
      2147483648L + c

  /** Run `rounds` Luby rounds over a SYMMETRIZED edge table (pass both
    * directions; self-loops are dropped). Nodes are the distinct sources.
    * Output: (node, status, round) — status ∈ mis | dominated (a MIS
    * neighbor) | undecided (round budget exhausted; round = 0).
    */
  def luby(edges: DataFrame, srcCol: String, dstCol: String,
           rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds must be 1..8, got $rounds")
    val e = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    var active = e.select(col("u").as("node")).distinct().localCheckpoint()
    var decided: DataFrame = active.limit(0)
      .select(col("node"), lit("x").as("status"), lit(0).as("round"))
    for (r <- 1 to rounds) {
      val ae = e
        .join(active.select(col("node").as("au")), col("u") === col("au"),
          "leftsemi")
        .join(active.select(col("node").as("av")), col("v") === col("av"),
          "leftsemi")
      val nbMin = ae.groupBy(col("u")).agg(min(prio(col("v"))).as("minp"))
      val mis = active.join(nbMin, col("node") === col("u"), "left")
        .filter(col("minp").isNull || prio(col("node")) < col("minp"))
        .select(col("node"))
        .localCheckpoint()
      val dominated = e
        .join(mis.select(col("node").as("mnode")), col("u") === col("mnode"),
          "leftsemi")
        .select(col("v").as("node")).distinct()
        .join(active, Seq("node"), "leftsemi")
        .localCheckpoint()
      decided = decided
        .unionByName(mis.select(col("node"), lit("mis").as("status"),
          lit(r).as("round")))
        .unionByName(dominated.select(col("node"),
          lit("dominated").as("status"), lit(r).as("round")))
      active = active
        .join(mis, Seq("node"), "leftanti")
        .join(dominated, Seq("node"), "leftanti")
        .localCheckpoint()
    }
    decided.unionByName(active.select(col("node"),
      lit("undecided").as("status"), lit(0).as("round")))
  }
}
