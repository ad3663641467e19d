package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.{StateStores, StreamingSessionize}
import graft.engine.streaming.StreamingSessionize.SessEvent

/** The 100 TB state-store path: `spark.graft.stateStore=rocksdb` flips
  * the live twins' state off the default in-executor-memory provider
  * onto RocksDB (disk-spilling — the only provider that survives
  * unbounded key cardinality). This spec pins (a) the knob mapping,
  * including the loud rejection of junk values, and (b) one live twin
  * — sessionize, flatMapGroupsWithState + EventTimeTimeout, the op
  * whose per-user open-session state is exactly what grows without
  * bound — running end-to-end under RocksDB and emitting the identical
  * session set as the batch `ts_sessionize` query. */
class RocksDbStateStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("knob mapping: rocksdb / hdfs / default / unset / junk") {
    assert(StateStores.providerFor(None).isEmpty)
    assert(StateStores.providerFor(Some("rocksdb"))
      .contains(StateStores.RocksDbProvider))
    assert(StateStores.providerFor(Some("ROCKSDB"))
      .contains(StateStores.RocksDbProvider))
    assert(StateStores.providerFor(Some("hdfs"))
      .contains(StateStores.HdfsProvider))
    assert(StateStores.providerFor(Some("default"))
      .contains(StateStores.HdfsProvider))
    val e = intercept[IllegalArgumentException] {
      StateStores.providerFor(Some("leveldb"))
    }
    assert(e.getMessage.contains(StateStores.Knob))
  }

  test("configureForTws pins RocksDB and rejects a conflicting hdfs knob") {
    SparkTest.confLock.synchronized {
      val priorKnob = spark.conf.getOption(StateStores.Knob)
      val priorProvider = spark.conf.getOption(StateStores.ProviderKey)
      try {
        // unset knob → RocksDB pinned (transformWithState accepts no
        // other provider, so the builder must not inherit the session's)
        spark.conf.unset(StateStores.Knob)
        spark.conf.set(StateStores.ProviderKey, StateStores.HdfsProvider)
        StateStores.configureForTws(spark)
        assert(spark.conf.get(StateStores.ProviderKey) ==
          StateStores.RocksDbProvider)
        // rocksdb knob → same pin, no error
        spark.conf.set(StateStores.Knob, "rocksdb")
        StateStores.configureForTws(spark)
        assert(spark.conf.get(StateStores.ProviderKey) ==
          StateStores.RocksDbProvider)
        // an EXPLICIT hdfs knob is a configuration conflict: fail with
        // the knob's name, not Spark's opaque provider assertion at
        // query start (round-16 advice: the generic configure() made
        // the "safe to flip per deployment" claim false for funnel)
        spark.conf.set(StateStores.Knob, "hdfs")
        val e = intercept[IllegalArgumentException] {
          StateStores.configureForTws(spark)
        }
        assert(e.getMessage.contains(StateStores.Knob))
        assert(e.getMessage.contains("transformWithState"))
      } finally {
        priorKnob match {
          case Some(v) => spark.conf.set(StateStores.Knob, v)
          case None => spark.conf.unset(StateStores.Knob)
        }
        priorProvider match {
          case Some(v) => spark.conf.set(StateStores.ProviderKey, v)
          case None => spark.conf.unset(StateStores.ProviderKey)
        }
      }
    }
  }

  test("the live sessionize twin matches the batch query under RocksDB") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id")
      .as[SessEvent]
      .collect()
      .sortBy(e => (graft.engine.streaming.EventTime.micros(e.ts), e.event_id))
    assert(events.length > 100, "testdata sanity")
    val half = events.length / 2
    val maxMs = events.map(_.ts.getTime).max
    val sentinel =
      SessEvent(events.head.user_id, new Timestamp(maxMs + 49L * 3600 * 1000),
        Long.MaxValue)

    SparkTest.confLock.synchronized {
      val priorKnob = spark.conf.getOption(StateStores.Knob)
      val priorProvider = spark.conf.getOption(StateStores.ProviderKey)
      spark.conf.set(StateStores.Knob, "rocksdb")
      try {
        implicit val sqlCtx = spark.sqlContext
        val input = MemoryStream[SessEvent]
        // NOTE: no explicit StateStores.configure here — the twin's
        // BUILDER applies the knob (round-15 wiring), which is what
        // this asserts
        val q = StreamingSessionize.sessions(
            input.toDS().withWatermark("ts", "0 seconds"))
          .writeStream
          .outputMode(StreamingSessionize.outputMode)
          .format("memory")
          .queryName("rocksdb_sessions")
          .start()
        assert(spark.conf.get(StateStores.ProviderKey) ==
          StateStores.RocksDbProvider,
          "the sessions() builder must apply the knob itself")
        try {
          // two data batches (state must survive a RocksDB commit
          // boundary), then the watermark sentinel + one batch for the
          // timeouts to fire against it
          input.addData(events.take(half).toIndexedSeq)
          q.processAllAvailable()
          input.addData(events.drop(half).toIndexedSeq)
          q.processAllAvailable()
          input.addData(Seq(sentinel)); q.processAllAvailable()
          input.addData(Seq(sentinel.copy(event_id = Long.MaxValue - 1)))
          q.processAllAvailable()
          // the query genuinely ran on RocksDB (not a silently ignored
          // conf): its progress reports the provider under stateOperators
          val usedRocksDb = q.recentProgress.exists { p =>
            Option(p.stateOperators).exists(_.exists(so =>
              Option(so.customMetrics).exists(m =>
                m.keySet().toArray.exists(
                  _.toString.toLowerCase.contains("rocksdb")))))
          }
          assert(usedRocksDb,
            "no rocksdb custom metrics in query progress — provider flip " +
              "did not take effect")
        } finally q.stop()
      } finally {
        priorKnob match {
          case Some(v) => spark.conf.set(StateStores.Knob, v)
          case None => spark.conf.unset(StateStores.Knob)
        }
        priorProvider match {
          case Some(v) => spark.conf.set(StateStores.ProviderKey, v)
          case None => spark.conf.unset(StateStores.ProviderKey)
        }
      }
    }

    val live = spark.sql("SELECT * FROM rocksdb_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .filter(_._4 <= maxMs * 1000L) // drop the sentinel's own session
      .toSet
    val batch = graft.engine.ops.Relational6.tsSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(live == batch,
      s"live-only: ${(live -- batch).take(3)}; batch-only: ${(batch -- live).take(3)}")
  }
}
