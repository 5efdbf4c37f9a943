package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent content digests for replication/backfill verification:
  * "is the copy of this partition byte-identical to the source?" answered
  * with one tiny digest table per side instead of a full anti-join — the
  * Merkle-tree idea applied to table slices.
  *
  * Two-level construction: each row hashes to a 32-hex md5; rows fan into
  * `buckets` leaves by their hash prefix; each leaf digests its SORTED row
  * hashes; the group digest then hashes the leaves in bucket order. Sorting
  * inside the leaf makes the digest row-order-independent (parquet rewrites
  * reorder rows freely), and the two levels bound what any single aggregate
  * must hold: a leaf holds |group|/buckets hashes, and at larger groups the
  * leaf table itself IS the comparison surface — compare leaf digests first
  * and only drill into unequal buckets (raise `buckets` with group size; the
  * flat single-level form is the degenerate buckets=1).
  *
  * Exactness/portability: the row rendering must be engine-identical, so
  * callers pass pre-stringified columns (integers, strings, dates — never a
  * raw double, whose text form is engine-specific); concat_ws('|') and md5
  * behave identically on both engines.
  */
object Integrity {

  /** Per-group two-level digest. Output: (group, n_rows, digest). */
  def groupDigest(df: DataFrame, group: Column, rowCols: Seq[Column],
                  buckets: Int = 16): DataFrame = {
    require(rowCols.nonEmpty, "need at least one row column")
    require(buckets >= 1 && buckets <= 256,
      s"buckets must lie in [1, 256], got $buckets")
    val rows = df.select(group.as("grp"),
        md5(concat_ws("|", rowCols: _*)).as("__rh"))
      .select(col("grp"), col("__rh"),
        (conv(substring(col("__rh"), 1, 2), 16, 10).cast("long") % buckets)
          .as("__bk"))
    val leaves = rows.groupBy(col("grp"), col("__bk"))
      .agg(count(lit(1)).as("__n"),
        md5(array_join(array_sort(collect_list(col("__rh"))), ""))
          .as("__leaf"))
    leaves.groupBy(col("grp"))
      .agg(sum(col("__n")).as("n_rows"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("__bk"), col("__leaf")))),
          e => e.getField("__leaf")), "")).as("digest"))
      .select(col("grp"), col("n_rows"), col("digest"))
  }

  /** MERKLE RANGE DRILL-DOWN — the anti-entropy sync primitive (Merkle
    * 1987; Dynamo-style replica repair, DeCandia et al. SOSP 2007): given
    * two versions of a table, find WHICH key buckets diverge by comparing
    * order-free bucket digests level by level — 16 buckets, then the 256
    * children of only the differing ones, then 4096 — so a 100 TB sync
    * audit ships O(diverged) digests instead of re-hashing everything
    * against everything.
    *
    * Buckets come from the KEY hash's hex prefix (length = level), so an
    * edited row stays in its bucket and shows as an xor mismatch at equal
    * counts, while inserts/deletes shift the count. The digest is
    * (count, bit_xor of a 60-bit row-content hash) — order-free, merge-
    * able, and cheap. Each level audits ONLY children of the previous
    * level's differing buckets (a semi-join on the hex-prefix parent).
    *
    * Exactness/portability: row rendering via concat_ws('|') of
    * pre-stringified columns, the [[groupDigest]] contract; bit_xor and
    * the 15-hex→60-bit conversion behave identically on both engines.
    *
    * Scale shape: per side per level one hash aggregate onto ≤ 16^level
    * groups (map-side combinable); the drill restriction is a broadcast
    * semi-join on differing parents; nothing ever joins row-to-row.
    *
    * Output, ordered: (level, bucket, n_a, n_b, differs) — every audited
    * bucket at each level (level 1 audits all 16).
    */
  def merkleDrill(a: DataFrame, b: DataFrame, keyCols: Seq[Column],
                  rowCols: Seq[Column], levels: Int = 3): DataFrame = {
    require(rowCols.nonEmpty && keyCols.nonEmpty, "need key and row columns")
    require(levels >= 1 && levels <= 4, s"levels must be 1..4, got $levels")
    // ONE corpus aggregation per side onto the leaf (deepest) buckets;
    // parent registers roll up from child registers (counts add, xors
    // xor) — the actual Merkle-tree construction, no per-level re-scan.
    def leaf(df: DataFrame): DataFrame = df
      .select(substring(md5(concat_ws("|", keyCols: _*)), 1, levels)
          .as("bucket"),
        conv(substring(md5(concat_ws("|", rowCols: _*)), 1, 15), 16, 10)
          .cast("long").as("__h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("x"))
      .localCheckpoint(eager = true)
    drillFromLeaves(leaf(a), leaf(b), levels)
  }

  /** One-scan twin of [[merkleDrill]] for the common sync-audit case where
    * version B DERIVES from version A by a filter plus a sparse edit: the
    * caller renders both sides' hashes in a single pass over the shared
    * input — `hashed` holds (side 'a'|'b', kh = md5 hex of the key
    * rendering, h = the 60-bit row-content hash), with unedited rows
    * REUSING the a-side content hash — and both sides' leaf registers come
    * from ONE aggregation of that table. Versus materializing the two
    * sides: half the corpus scans, and content md5s only where the row
    * actually changed (r16; at a 100 TB audit the second full-table hash
    * pass is the dominant cost this removes). Output is identical to
    * merkleDrill on the materialized sides (IntegritySpec differential).
    */
  def merkleDrillHashed(hashed: DataFrame, levels: Int = 3): DataFrame = {
    require(levels >= 1 && levels <= 4, s"levels must be 1..4, got $levels")
    val leaves = hashed
      .select(col("side"), substring(col("kh"), 1, levels).as("bucket"),
        col("h").as("__h"))
      .groupBy(col("side"), col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("x"))
      .localCheckpoint(eager = true)
    drillFromLeaves(
      leaves.filter(col("side") === "a").select("bucket", "n", "x"),
      leaves.filter(col("side") === "b").select("bucket", "n", "x"), levels)
  }

  /** Shared drill core over the two sides' LEAF registers (already
    * materialized; ≤ 16^levels rows each): per-level rollups (counts add,
    * xors xor) and the full-outer compares restricted to differing
    * parents.
    */
  private def drillFromLeaves(leafA: DataFrame, leafB: DataFrame,
                              levels: Int): DataFrame = {
    val la = scala.collection.mutable.Map(levels -> leafA)
    val lb = scala.collection.mutable.Map(levels -> leafB)
    for (l <- (levels - 1) to 1 by -1) {
      def up(child: DataFrame): DataFrame = child
        .groupBy(substring(col("bucket"), 1, l).as("bucket"))
        .agg(sum(col("n")).as("n"), expr("bit_xor(x)").as("x"))
      la(l) = up(la(l + 1)); lb(l) = up(lb(l + 1))
    }
    def compare(l: Int, parents: Option[DataFrame]): DataFrame = {
      def side(regs: DataFrame) = parents match {
        case Some(p) => regs.join(broadcast(p.select(col("pb"))),
          substring(col("bucket"), 1, l - 1) === col("pb"), "leftsemi")
        case None => regs
      }
      side(la(l)).withColumnsRenamed(Map("n" -> "n_a", "x" -> "x_a"))
        .join(side(lb(l)).withColumnsRenamed(Map("n" -> "n_b", "x" -> "x_b")),
          Seq("bucket"), "full_outer")
        .select(lit(l).as("level"), col("bucket"),
          coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"),
          (!(col("n_a") <=> col("n_b")) || !(col("x_a") <=> col("x_b")))
            .as("differs"))
    }
    var out = compare(1, None)
    var acc = Seq(out)
    for (l <- 2 to levels) {
      val parents = out.filter(col("differs"))
        .select(col("bucket").as("pb"))
      out = compare(l, Some(parents))
      acc = acc :+ out
    }
    acc.reduce(_ unionByName _).orderBy(col("level"), col("bucket"))
  }
}
