package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shard-placement audits for distributed serving: consistent hashing
  * (Karger et al., STOC'97 — the ring with virtual nodes) and rendezvous /
  * highest-random-weight hashing (Thaler & Ravishankar, ToN'98). Both answer
  * the question a 100 TB serving tier asks before resharding: how balanced is
  * the placement, and how many keys MOVE when the node set changes — the
  * property that separates these schemes from `hash(key) % n` (where a ±1
  * node change relocates ~all keys).
  *
  * Exactness: every hash is the repo's standard 32-bit md5 prefix of a
  * tagged string (`n:<node>:<vnode>`, `k:<key>`, `r:<node>:<key>`), so both
  * engines compute identical integer weights; owner selection is pure
  * integer MIN/MAX with deterministic struct tie-breaks. No floats anywhere.
  *
  * Scale shape: the ring / node list is O(nodes·vnodes) and broadcast; keys
  * are never shuffled — ownership resolves map-side under the broadcast
  * (the clockwise-successor search is a broadcast theta-join on a ~100-row
  * build side), and only the per-node counts aggregate.
  */
object Sharding {

  /** 32-bit md5-prefix hash of a string column — the repo's standard,
    * `('0x' || substr(md5(s), 1, 8))::BIGINT` on the DuckDB side.
    */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The ring: `nNodes`·`vnodes` points (node, vnode, point_hash), each
    * point at h32("n:<node>:<vnode>"). A node's points are a function of
    * (node, vnode) ONLY — growing the cluster adds points without moving
    * any existing one, which is what bounds relocation to the new node's
    * arc segments.
    */
  def ring(spark: SparkSession, nNodes: Int, vnodes: Int): DataFrame = {
    require(nNodes >= 1 && vnodes >= 1,
      s"need nNodes >= 1 and vnodes >= 1, got $nNodes/$vnodes")
    spark.range(nNodes.toLong * vnodes).select(
      (col("id") / vnodes).cast("long").as("node"),
      (col("id") % vnodes).cast("long").as("vnode"))
      .select(col("node"), col("vnode"),
        h32(concat(lit("n:"), col("node").cast("string"), lit(":"),
          col("vnode").cast("string"))).as("ph"))
  }

  /** Consistent-hash owner per key: the clockwise successor — the ring
    * point with the smallest hash ≥ the key's hash, wrapping to the
    * globally smallest point. Ties (a 32-bit point-hash collision) break to
    * the smaller node id on both engines. Output: (key, node).
    */
  def consistentOwners(keys: DataFrame, keyCol: String,
                       ringDf: DataFrame): DataFrame = {
    val k = keys.select(col(keyCol).as("key"),
      h32(concat(lit("k:"), col(keyCol).cast("string"))).as("kh"))
    val succ = k.join(broadcast(ringDf), col("ph") >= col("kh"))
      .groupBy(col("key"))
      .agg(min(struct(col("ph"), col("node"))).as("m"))
      .select(col("key"), col("m.node").as("succ_node"))
    val wrap = ringDf
      .agg(min(struct(col("ph"), col("node"))).as("m"))
      .select(col("m.node").as("wrap_node"))
    k.select(col("key"))
      .join(succ, Seq("key"), "left")
      .crossJoin(broadcast(wrap))
      .select(col("key"),
        coalesce(col("succ_node"), col("wrap_node")).as("node"))
  }

  /** Rendezvous (HRW) owner per key: argmax over nodes of
    * h32("r:<node>:<key>"). No ring, no virtual nodes — and removing a node
    * re-homes ONLY that node's keys (every other key's argmax is untouched),
    * the minimal-disruption guarantee the audit below asserts. Ties break to
    * the larger node id on both engines. Output: (key, node).
    */
  def rendezvousOwners(keys: DataFrame, keyCol: String,
                       nodes: DataFrame): DataFrame =
    keys.select(col(keyCol).as("key"))
      .crossJoin(broadcast(nodes.select(col("node"))))
      .select(col("key"), col("node"),
        h32(concat(lit("r:"), col("node").cast("string"), lit(":"),
          col("key").cast("string"))).as("w"))
      .groupBy(col("key"))
      .agg(max(struct(col("w"), col("node"))).as("m"))
      .select(col("key"), col("m.node").as("node"))
}
