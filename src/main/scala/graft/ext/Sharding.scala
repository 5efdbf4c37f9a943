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
  * are never shuffled — consistent-hash ownership is a codegen'd filter
  * over ONE broadcast sorted array of packed ring entries, rendezvous
  * ownership a map-side argmax under a broadcast node list — and only the
  * per-node counts aggregate.
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

  /** Node-id space inside a packed ring entry: entry = ph·2²⁰ + node, so
    * ordering entries orders (hash, node) — the smallest entry with
    * ph ≥ kh IS the successor with the smaller-node tie rule.
    */
  val NodeSpace: Long = 1L << 20

  /** Consistent-hash owner per key: the clockwise successor — the ring
    * point with the smallest hash ≥ the key's hash, wrapping to the
    * globally smallest point. Ties (a 32-bit point-hash collision) break to
    * the smaller node id on both engines. Output: (key, node).
    *
    * The whole ring packs into ONE broadcast sorted array (entry =
    * ph·2²⁰ + node), and the successor search runs inside the key scan as
    * a codegen'd array filter — no join, no aggregation, nothing but the
    * final per-node counts ever shuffles. Any entry ≥ kh·2²⁰ has ph ≥ kh
    * (node < 2²⁰), so `filter(arr, e ≥ kh·2²⁰)[1]` is exactly the
    * tie-broken successor and `arr[1]` the wrap-around.
    */
  def consistentOwners(keys: DataFrame, keyCol: String,
                       ringDf: DataFrame): DataFrame = {
    // Loud guard (the Winnowing position-space pattern): the packing is
    // only injective for 0 ≤ node < NodeSpace — a caller-supplied ring with
    // ids outside that range would silently corrupt both the successor
    // ordering and the pmod-recovered owner, so fail the job instead.
    val ringArr = ringDf
      .agg(sort_array(collect_list(col("ph") * NodeSpace + col("node")))
        .as("__ring"),
        max(col("node")).as("__maxn"), min(col("node")).as("__minn"))
      .select(when(col("__maxn") < NodeSpace && col("__minn") >= 0,
        col("__ring"))
        .otherwise(raise_error(concat(
          lit(s"consistentOwners: node ids must be in [0, $NodeSpace), got ["),
          col("__minn").cast("string"), lit(", "),
          col("__maxn").cast("string"), lit("]")))).as("__ring"))
    keys.select(col(keyCol).as("key"),
        h32(concat(lit("k:"), col(keyCol).cast("string"))).as("kh"))
      .crossJoin(broadcast(ringArr))
      .select(col("key"),
        pmod(coalesce(
          try_element_at(filter(col("__ring"),
            e => e >= col("kh") * NodeSpace), lit(1)),
          element_at(col("__ring"), 1)), lit(NodeSpace)).as("node"))
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
