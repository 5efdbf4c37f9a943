package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV buffer: at most k DISTINCT hash values, kept sorted ascending. */
case class KmvBuf(hs: Seq[Long])

/** Bounded k-minimum-values aggregate: keeps the k smallest DISTINCT hash
  * values per group — the streaming/partial-aggregation form of
  * [[graft.ext.Kmv]]'s TakeOrdered sketch. Distinctness is part of the
  * contract (KMV is a sample of the DISTINCT set; a duplicate arrival must
  * be a no-op), which is why [[TopKAggregator]] — which happily holds
  * duplicate (id, score) entries — cannot stand in.
  *
  * Like every Aggregator here it participates in partial aggregation: each
  * map-side partition forwards at most k longs per group, and the merged
  * buffer is exactly the k smallest distinct values either input knew.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: KmvBuf = KmvBuf(Vector.empty)

  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    if (b.hs.length >= k && h >= b.hs.last) b // can't enter the sketch
    else if (b.hs.contains(h)) b              // duplicate arrival: no-op
    else KmvBuf((b.hs :+ h).sorted.take(k))
  }

  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
    KmvBuf((x.hs ++ y.hs).distinct.sorted.take(k))

  override def finish(b: KmvBuf): KmvBuf = b

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}
