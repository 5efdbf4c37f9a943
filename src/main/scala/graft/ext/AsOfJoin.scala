package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for each left row, attach the payload of the most
  * recent right row with the same key and right time ≤ left time (DuckDB/kdb
  * `ASOF LEFT JOIN` semantics, inclusive). An operator Spark's built-ins lack;
  * the naive formulation (inequality theta-join + argmax) degenerates to a
  * BroadcastNestedLoopJoin over every (left × right-with-same-key) pair.
  *
  * This implementation never builds that product: both sides are UNIONed into
  * one keyed timeline, and a single `last(payload, ignoreNulls) OVER
  * (PARTITION BY key ORDER BY time ROWS UNBOUNDED PRECEDING..CURRENT)` window
  * carries the latest right payload forward onto each left row. Cost is ONE
  * shuffle of left+right keyed by the join key plus a per-key sort — the same
  * profile as sessionize, and the same whale-key caveat (a key holding a large
  * fraction of both sides serializes its partition; pre-aggregate the right
  * side per (key, time) — as [[graft.ExtQueries.qAsofLastOrder]] does — to keep
  * timelines short).
  *
  * At equal timestamps the right row sorts FIRST (side flag), so a right row
  * timestamped exactly at the left row's time IS matched — inclusive bound,
  * matching DuckDB. Right payload columns must not collide with left column
  * names; left rows with no prior right row get null payloads.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payloadCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    require(payloadCols.intersect(lCols).isEmpty,
      s"payload columns ${payloadCols.intersect(lCols)} collide with left columns")
    val rSchema = right.schema
    val l = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        lCols.map(col) ++
        payloadCols.map(c => lit(null).cast(rSchema(c).dataType).as(s"__p_$c")): _*)
    val lSchema = left.schema
    val r = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        lCols.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .select(Seq(col("__side")) ++ lCols.map(col) ++
        payloadCols.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
