package graft.engine.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY §2.C's reserved
  * `Aggregator[IN, BUF, OUT]`): keeps the k highest-scoring (id,
  * score) pairs with ties broken by lower id. The buffer never exceeds
  * k entries, so partial aggregation ships O(k) per task instead of
  * sorting the corpus — at 100 TB this replaces a global
  * sort-and-limit with per-partition heaps + an O(k·#partitions)
  * merge, the same shape as Spark's TakeOrdered but available inside
  * any groupBy.
  *
  * Determinism: merge order varies across runs, but the result is a
  * pure function of the input SET (greatest k by (score, -id)), so the
  * output is stable given tie-broken inputs.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), TopKAggregator.Buf, Seq[(Long, Double)]] {
  import TopKAggregator.Buf

  /** Descending score, ascending id — the keep-order. */
  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortWith(better).take(k)

  override def zero: Buf = Buf(Seq.empty)
  override def reduce(buf: Buf, in: (Long, Double)): Buf =
    if (in._2.isNaN) buf
    // O(1) fast path for the dominant case at scale: a full buffer whose
    // worst kept entry beats the candidate is returned untouched — the
    // per-row re-sort only runs while the buffer is still competitive
    else if (buf.items.size >= k && better(buf.items.last, in)) buf
    else Buf(trim(buf.items :+ in))
  override def merge(a: Buf, b: Buf): Buf = Buf(trim(a.items ++ b.items))
  override def finish(buf: Buf): Seq[(Long, Double)] = trim(buf.items)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}

object TopKAggregator {
  /** Encoder carrier (Spark needs a Product wrapper for Seq buffers). */
  case class Buf(items: Seq[(Long, Double)])
}
