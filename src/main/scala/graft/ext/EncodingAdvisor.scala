package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Columnar ENCODING ADVISOR — the profiling pass a lakehouse writer (or a
  * table-layout audit) runs before choosing per-column encodings: for each
  * candidate column, measure cardinality, run structure, and byte volume,
  * cost out PLAIN vs DICTIONARY vs RLE under a transparent model, and
  * recommend the cheapest. The same statistics Parquet/ORC writers gather
  * per page, computed corpus-wide per column (Abadi, Madden & Ferreira,
  * "Integrating compression and execution in column-oriented database
  * systems", SIGMOD 2006).
  *
  * Cost model (all-integer, both engines agree bit-for-bit):
  *   plain = Σ octet_length(value-as-string)
  *   dict  = ⌈n·bits/8⌉ + Σ_{distinct} octet_length(v), bits = ⌈log2 ndv⌉
  *           (floor-log2 via length(bin(ndv−1)); ndv=1 → 1 bit)
  *   rle   = Σ_{runs} (octet_length(run value) + 4)
  * Runs are counted within each sort GROUP (the writer's row-group
  * analogy): rows order by (group, seq); a group boundary always starts a
  * new run, so the pass needs only group-PARTITIONED windows — no global
  * window, no cross-partition state.
  *
  * Scale shape: one explode(k columns) over the scan, one
  * (column, group)-partitioned lag window, one hash aggregate per column,
  * plus one distinct-value aggregate for the dictionary side — every stage
  * keyed, map-side combinable where applicable.
  */
object EncodingAdvisor {

  /** Profile `cols` of `df` (values compared and measured via their string
    * form — pass integer/string columns). Output per column:
    * (col_name, n, ndv, n_runs, avg_run_len, plain_bytes, dict_bytes,
    * rle_bytes, recommended) ordered by column name. Tie-break:
    * rle ≤ dict ≤ plain.
    */
  def advise(df: DataFrame, groupCol: Column, seqCol: Column,
             cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "advise needs at least one column")
    val rows = df.select(
      groupCol.as("__g"), seqCol.as("__s"),
      explode(array(cols.map(c =>
        struct(lit(c).as("cname"), col(c).cast("string").as("v"))): _*))
        .as("e"))
      .select(col("__g"), col("__s"), col("e.cname").as("cname"),
        col("e.v").as("v"))
    val w = Window.partitionBy(col("cname"), col("__g")).orderBy(col("__s"))
    val flagged = rows.withColumn("newrun",
      when(row_number().over(w) === 1 or
        !(col("v") <=> lag(col("v"), 1).over(w)), 1L).otherwise(0L))
    val perCol = flagged.groupBy(col("cname"))
      .agg(count(lit(1)).as("n"),
        sum(col("newrun")).as("n_runs"),
        sum(octet_length(col("v")).cast("long")).as("plain_bytes"),
        sum(when(col("newrun") === 1,
          octet_length(col("v")).cast("long") + 4L).otherwise(0L))
          .as("rle_bytes"))
    val dict = rows.select(col("cname"), col("v")).distinct()
      .groupBy(col("cname"))
      .agg(count(lit(1)).as("ndv"),
        sum(octet_length(col("v")).cast("long")).as("dict_val_bytes"))
    perCol.join(dict, Seq("cname"))
      .withColumn("bits",
        length(bin(greatest(col("ndv") - 1, lit(1L)))).cast("long"))
      .select(col("cname").as("col_name"), col("n"), col("ndv"),
        col("n_runs"),
        round(col("n").cast("double") / col("n_runs").cast("double"), 6)
          .as("avg_run_len"),
        col("plain_bytes"),
        (expr("(n * bits + 7) div 8") + col("dict_val_bytes"))
          .as("dict_bytes"),
        col("rle_bytes"))
      .withColumn("recommended",
        when(col("rle_bytes") <= col("dict_bytes") &&
          col("rle_bytes") <= col("plain_bytes"), lit("rle"))
          .when(col("dict_bytes") <= col("plain_bytes"), lit("dict"))
          .otherwise(lit("plain")))
      .orderBy(col("col_name"))
  }
}
