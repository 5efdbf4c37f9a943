package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed graph coloring — Jones & Plassmann, "A
  * parallel graph coloring heuristic" (SIAM J. Sci. Comput. 1993): the
  * third symmetry-breaking primitive next to [[Mis]] and [[Matching]].
  * Nodes carry unique md5-derived priorities; per round, every UNCOLORED
  * node whose priority beats all its uncolored neighbors picks the
  * smallest color unused by its already-colored neighbors. Winners never
  * conflict (two adjacent uncolored nodes can't both be local minima), so
  * the result is a proper coloring built in O(rounds) sweeps. Conflict-
  * free scheduling, register allocation at graph scale, channel
  * assignment.
  *
  * The smallest-free-color (mex) is computed RELATIONALLY — candidates
  * 0..#used from a sequence explode, anti-joined against the used-color
  * set, min per node — no array fold, so the SQL oracle states the same
  * plan. Edge multiplicity is harmless (min-priority and distinct-color
  * aggregates), as in [[Mis.luby]].
  *
  * Scale shape: per round, one min-aggregate over surviving
  * uncolored-edge rows, one join of winner adjacency against the colored
  * table, one bounded candidate explode (≤ degree+1 per winner), two
  * checkpoints (new colors, shrunk edge table) — rounds collapse
  * geometrically, and no table ever exceeds the live subgraph.
  */
object Coloring {

  private def prio(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") *
      2147483648L + c

  /** Color the undirected graph (any edge orientation; symmetrized and
    * self-loop-stripped internally) with at most `rounds` Jones-Plassmann
    * sweeps. Output: (node, color, round) — color ≥ 0 with the 1-based
    * round that assigned it, or color = −1 / round = 0 for nodes still
    * uncolored when the budget ran out.
    */
  def jonesPlassmann(edges: DataFrame, srcCol: String, dstCol: String,
                     rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds must be 1..10, got $rounds")
    val raw = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = raw.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"),
        prio(col("e.v")).as("pv"))
      .localCheckpoint()
    val nodes = sym.select(col("u").as("node")).distinct()
      .select(col("node"), prio(col("node")).as("pn")).localCheckpoint()
    var eAct = sym
    var colored: DataFrame = nodes.limit(0)
      .select(col("node"), lit(0).as("color"), lit(0).as("round"))
    for (r <- 1 to rounds) {
      val active = nodes.join(colored.select(col("node")), Seq("node"),
        "leftanti")
      val nbMin = eAct.groupBy(col("u")).agg(min(col("pv")).as("minp"))
      val winners = active.join(nbMin, col("node") === col("u"), "left")
        .filter(col("minp").isNull || col("pn") < col("minp"))
        .select(col("node"))
      // colors already used around each winner (full adjacency × colored)
      val used = sym.join(winners.select(col("node").as("wn")),
          col("u") === col("wn"), "leftsemi")
        .join(colored.select(col("node").as("cn"), col("color")),
          col("v") === col("cn"))
        .select(col("u").as("wnode"), col("color")).distinct()
      val nUsed = winners
        .join(used.groupBy(col("wnode")).agg(count(lit(1)).as("n")),
          col("node") === col("wnode"), "left")
        .select(col("node"), coalesce(col("n"), lit(0L)).as("n"))
      val picked = nUsed
        .select(col("node"), explode(sequence(lit(0L), col("n"))).as("cand"))
        .join(used, col("node") === col("wnode") &&
          col("cand") === col("color"), "leftanti")
        .groupBy(col("node")).agg(min(col("cand")).cast("int").as("color"))
        .select(col("node"), col("color"), lit(r).as("round"))
        .localCheckpoint()
      colored = colored.unionByName(picked)
      if (r < rounds) {
        val wn = picked.select(col("node"))
        eAct = eAct
          .join(wn.select(col("node").as("du")), col("u") === col("du"),
            "leftanti")
          .join(wn.select(col("node").as("dv")), col("v") === col("dv"),
            "leftanti")
          .localCheckpoint()
      }
    }
    colored.unionByName(
      nodes.join(colored.select(col("node")), Seq("node"), "leftanti")
        .select(col("node"), lit(-1).as("color"), lit(0).as("round")))
  }
}
