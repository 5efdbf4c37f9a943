package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One tracked counter of a SpaceSaving sketch: estimated count is an UPPER
  * bound on the true count; `err` bounds the overestimate (true ≥ est − err).
  */
case class SSCounter(item: String, est: Long, err: Long)

/** SpaceSaving buffer: at most `capacity` counters. */
case class SSBuf(counters: Seq[SSCounter])

/** SpaceSaving (Metwally et al.) approximate frequent items — the
  * heavy-hitters sketch completing the approximate family next to HLL
  * distinct counts, KLL-style quantiles, Bloom membership, and MinHash
  * similarity: fixed memory (`capacity` counters) regardless of cardinality,
  * with the classic guarantees
  *
  *  - any item with true count > N/capacity IS tracked (no false dismissal of
  *    true heavy hitters at that threshold), and
  *  - per tracked item, `est − err ≤ true ≤ est`.
  *
  * As an [[Aggregator]] it participates in partial aggregation: each map-side
  * partition maintains its own sketch and forwards `capacity` counters, so
  * shuffle volume is O(#partitions × capacity), never O(#rows). The merge
  * (pairwise counter sum, overflow into `err` for items untracked on one
  * side, re-trim to capacity) preserves the upper/lower-bound invariants —
  * the spec checks them against exact counts on skewed data.
  *
  * Exact when every distinct item fits in `capacity` (err stays 0) — the spec
  * locks that too. Not SQL-oracle-able (sketch contents depend on partition
  * layout); guarantees are property-tested instead, like the HLL and KLL
  * paths.
  */
class SpaceSavingAggregator(capacity: Int)
    extends Aggregator[String, SSBuf, Seq[SSCounter]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: SSBuf = SSBuf(Vector.empty)

  override def reduce(b: SSBuf, item: String): SSBuf = {
    val idx = b.counters.indexWhere(_.item == item)
    if (idx >= 0) {
      val c = b.counters(idx)
      SSBuf(b.counters.updated(idx, c.copy(est = c.est + 1)))
    } else if (b.counters.length < capacity) {
      SSBuf(b.counters :+ SSCounter(item, 1L, 0L))
    } else {
      // replace the minimum counter: new item inherits its count as error
      val minIdx = b.counters.zipWithIndex
        .minBy { case (c, _) => (c.est, c.item) }._2
      val m = b.counters(minIdx)
      SSBuf(b.counters.updated(minIdx, SSCounter(item, m.est + 1, m.est)))
    }
  }

  override def merge(x: SSBuf, y: SSBuf): SSBuf = {
    if (x.counters.isEmpty) return y
    if (y.counters.isEmpty) return x
    // An item tracked on only one side may also have occurred untracked on the
    // other: its count there is bounded by that side's minimum counter value,
    // which is added to est AND err (keeps est an upper bound and est-err a
    // lower bound).
    val xMin = if (x.counters.length < capacity) 0L else x.counters.map(_.est).min
    val yMin = if (y.counters.length < capacity) 0L else y.counters.map(_.est).min
    val ym = y.counters.map(c => c.item -> c).toMap
    val merged = scala.collection.mutable.ArrayBuffer[SSCounter]()
    x.counters.foreach { c =>
      ym.get(c.item) match {
        case Some(d) => merged += SSCounter(c.item, c.est + d.est, c.err + d.err)
        case None    => merged += SSCounter(c.item, c.est + yMin, c.err + yMin)
      }
    }
    y.counters.foreach { d =>
      if (!x.counters.exists(_.item == d.item))
        merged += SSCounter(d.item, d.est + xMin, d.err + xMin)
    }
    SSBuf(merged.sortBy(c => (-c.est, c.item)).take(capacity).toVector)
  }

  override def finish(b: SSBuf): Seq[SSCounter] =
    b.counters.sortBy(c => (-c.est, c.item))

  override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  override def outputEncoder: Encoder[Seq[SSCounter]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSCounter]]()
}
