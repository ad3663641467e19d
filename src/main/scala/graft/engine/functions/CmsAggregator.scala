package graft.engine.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Typed count-min-sketch aggregator: the d×w counter table held as
  * FIXED-SIZE partial-aggregate state — the production shape of every
  * streaming/distributed sketch (partial sketches per task, one
  * elementwise merge), versus the explode(d)-then-hash-aggregate
  * spelling that fans every input row out d× before the shuffle.
  * Per input key: d bucket increments in a flat long[d·w]; merge is
  * elementwise add; the shuffle carries ONE d·w-cell array per
  * partition regardless of input rows.
  *
  * Bucket function is the engine's cross-engine [[VectorOps.polyHash]]
  * of `"j:key"` — IDENTICAL cells to the declarative build and to the
  * DuckDB oracle's sketch, so swapping the build keeps `agg_countmin`
  * hash-gated (parity property-tested in PropertySpec).
  */
class CmsAggregator(d: Int, w: Int)
  extends Aggregator[Long, CmsAggregator.Buf, Seq[Long]] {
  import CmsAggregator.Buf

  override def zero: Buf = Buf(new Array[Long](d * w))

  override def reduce(buf: Buf, key: Long): Buf = {
    val t = buf.cells
    var j = 0
    while (j < d) {
      val h = VectorOps.polyHash(UTF8String.fromString(s"$j:$key"))
      t(j * w + (h % w).toInt) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val (x, y) = (a.cells, b.cells)
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    a
  }

  override def finish(buf: Buf): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf.cells)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object CmsAggregator {
  /** Encoder carrier; the array is mutated in place by reduce/merge
    * (sanctioned for Aggregator buffers — Spark row-encodes between
    * exchanges, not between reduce calls). */
  case class Buf(cells: Array[Long])
}
