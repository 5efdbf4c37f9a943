package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical prefix rollups over delimited path-like columns — the
  * OLAP pattern for URL hosts/paths, taxonomy strings, and multi-word
  * category labels ("STANDARD BRUSHED COPPER" → STANDARD, STANDARD
  * BRUSHED, STANDARD BRUSHED COPPER): aggregate a measure at EVERY prefix
  * depth in one pass.
  */
object Hierarchy {

  /** Per-prefix aggregate of `valueCol` (an exact integer measure) at
    * depths 1..`maxLevels`: each row explodes into its prefixes scan-side
    * (maxLevels small structs per row — no joins, no recursion), then one
    * (level, prefix)-keyed aggregate. Rows with fewer than `level` words
    * contribute only the prefixes they have. The ROLLUP/GROUPING-SETS
    * contrast: those need the hierarchy as separate COLUMNS; this derives
    * it from the string, the shape taxonomy and URL data actually arrive
    * in.
    *
    * Output: (level, prefix, n_rows, total) — total an exact BIGINT sum.
    */
  def prefixRollup(df: DataFrame, pathCol: String, valueCol: String,
                   sep: String = " ", maxLevels: Int = 3): DataFrame = {
    require(maxLevels >= 1, s"maxLevels must be >= 1, got $maxLevels")
    val words = split(col(pathCol), java.util.regex.Pattern.quote(sep))
    val prefixes = array((1 to maxLevels).map { l =>
      struct(lit(l).as("level"),
        when(size(words) >= l,
          array_join(slice(words, 1, l), sep)).as("prefix"))
    }: _*)
    df.select(explode(prefixes).as("__p"),
        col(valueCol).cast("long").as("__v"))
      .select(col("__p.level").as("level"), col("__p.prefix").as("prefix"),
        col("__v"))
      .filter(col("prefix").isNotNull)
      .groupBy(col("level"), col("prefix"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("total"))
  }
}
