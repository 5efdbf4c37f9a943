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
}
