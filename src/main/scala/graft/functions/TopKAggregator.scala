package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) candidate flowing into a per-key top-k aggregation. */
case class Scored(id: Long, score: Double)

/** Aggregation buffer: at most k candidates, kept sorted by (-score, id). */
case class TopKBuf(items: Seq[Scored])

/** Bounded top-k aggregate: keeps the k highest-scoring (id, score) pairs per
  * group, ties broken by ascending id.
  *
  * This is the scale-correct shape for per-key top-k (e.g. k nearest neighbors
  * per query): unlike `row_number() OVER (PARTITION BY key ORDER BY score)` —
  * which shuffles EVERY scored row to the key's reducer before discarding all
  * but k — an Aggregator participates in partial aggregation, so each map-side
  * partition forwards at most k rows per key. Shuffle volume is
  * O(#keys × k × #partitions) worst case instead of O(#rows).
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  private def trim(items: Seq[Scored]): Seq[Scored] =
    items.sortBy(s => (-s.score, s.id)).take(k)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: Scored): TopKBuf = {
    // Fast reject: buffer full and the candidate can't beat the current floor.
    val floor = if (b.items.length < k) None else Some(b.items.last)
    if (floor.exists(f => a.score < f.score || (a.score == f.score && a.id > f.id))) b
    else TopKBuf(trim(b.items :+ a))
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf(trim(x.items ++ y.items))

  override def finish(b: TopKBuf): TopKBuf = b

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
