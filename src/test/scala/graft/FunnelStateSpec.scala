package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.FunnelState
import graft.engine.streaming.FunnelState.Ev

/** transformWithState funnel machine on a LIVE stream (RocksDB state
  * store, as the API requires), fed the driver testdata across a
  * micro-batch boundary, checked against the batch `stream_funnel`
  * window query over the same rows. */
class FunnelStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("live funnel state machine matches the batch window query") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[Ev].collect()
      .sortBy(e => (FunnelState.micros(e.ts), e.event_id))
    val (b1, b2) = events.splitAt(events.length / 2)

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    SparkTest.confLock.synchronized {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val q = FunnelState.funnel(input.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("funnel_live").start()
      try {
        input.addData(b1.toIndexedSeq); q.processAllAvailable()
        input.addData(b2.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    }

    // Update mode re-emits per touched batch; stage slots are
    // write-once so the deepest emit per user is the final state
    val live = spark.sql(
      "SELECT user_id, depth, t1s, t2s, t3s FROM funnel_live").collect()
      .map { r => r.getLong(0) ->
        (r.getInt(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)) }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }
    val batch = graft.engine.ops.StreamOps.streamFunnel(spark, sf).collect()
      .map { r => r.getLong(0) ->
        (r.getInt(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)) }.toMap
    assert(live.keySet == batch.keySet, "same user set")
    val diff = live.collect { case (u, v) if batch(u) != v => u -> (v, batch(u)) }
    assert(diff.isEmpty, s"funnel mismatch: ${diff.take(5)}")
  }

  test("equal-microsecond stages fold dependency-first: a same-ts " +
    "click/view/purchase reaches depth 3, like the batch query") {
    import spark.implicits._
    // the batch window conditions qualify at ts EQUALITY (view.ts >= t1);
    // the write-once slots only match that if the fold orders a stage's
    // dependency first at equal µs — by event_id alone the view (id 3)
    // would fold before the click (id 5) and be discarded forever
    val t = new java.sql.Timestamp(1755000000000L)
    val evs = Seq(
      Ev(1L, "view", t, 3L),
      Ev(1L, "purchase", t, 9L),
      Ev(1L, "click", t, 5L))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    SparkTest.confLock.synchronized {
      val prior = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[Ev]
        val q = FunnelState.funnel(input.toDS())
          .writeStream.outputMode("update")
          .format("memory").queryName("funnel_tie").start()
        try { input.addData(evs); q.processAllAvailable() } finally q.stop()
      } finally {
        prior match {
          case Some(v) => spark.conf.set(providerKey, v)
          case None => spark.conf.unset(providerKey)
        }
      }
    }
    val depth = spark.sql("SELECT max(depth) FROM funnel_tie")
      .collect()(0).getInt(0)
    assert(depth == 3, "same-ts stages must chain to full depth")
  }

  test("funnel state survives a query restart from the checkpoint") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[Ev].collect()
      .sortBy(e => (FunnelState.micros(e.ts), e.event_id))
    val (b1, b2) = events.splitAt(events.length / 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-funnel-ckpt").toString

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val acc = scala.collection.concurrent.TrieMap
      .empty[Long, (Int, Long, Long, Long)]
    SparkTest.confLock.synchronized {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // SAME MemoryStream across two query incarnations: the second
      // run recovers offsets + RocksDB state from the checkpoint
      val input = MemoryStream[Ev]
      def runOnce(feed: => Unit): Unit = {
        val q = FunnelState.funnel(input.toDS())
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[FunnelState.Funnel], _: Long) =>
              df.collect().foreach { f =>
                acc(f.user_id) = (f.depth,
                  f.t1s.getOrElse(-1L), f.t2s.getOrElse(-1L),
                  f.t3s.getOrElse(-1L))
              }
          }
          .start()
        try { feed; q.processAllAvailable() } finally q.stop()
      }
      runOnce { input.addData(b1.toIndexedSeq) }
      runOnce { input.addData(b2.toIndexedSeq) } // new query, old state
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    }

    val batch = graft.engine.ops.StreamOps.streamFunnel(spark, sf).collect()
      .map { r => r.getLong(0) ->
        (r.getInt(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)) }.toMap
    assert(acc.keySet == batch.keySet, "same user set after restart")
    val diff = acc.collect { case (u, v) if batch(u) != v => u -> (v, batch(u)) }
    assert(diff.isEmpty,
      s"state lost or corrupted across the restart: ${diff.take(5)}")
  }
}
