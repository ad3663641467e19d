package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.topics.FileTopicStore

/** DataSource V2 write path ([[graft.engine.sources.TopicSource]]):
  * appendV2 must be contract-identical to the RDD-based append() —
  * key-hash routing, per-partition contiguous offsets continuing the
  * existing log, seq-ordered intra-append offsets — and interoperate
  * with every reader and with compaction. */
class TopicWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private def newStore(parts: Int = 4): (FileTopicStore, String) = {
    val root = Files.createTempDirectory("graft-v2-write").toString
    (new FileTopicStore(spark, root, sleeper = _ => (), numPartitions = parts), root)
  }

  test("appendV2 round-trips through readAll/readV2 with contiguous per-partition offsets") {
    val (store, _) = newStore()
    store.create("t")
    import spark.implicits._
    store.appendV2("t", Seq(("a", "1"), ("b", "2"), ("c", "3"), (null, "4"))
      .toDF("key", "value"))
    val rows = store.readAll("t").collect()
    assert(rows.length == 4)
    // per-partition offsets are 0..n-1 with no gaps
    rows.groupBy(_.getInt(2)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sorted.sameElements(0L until rs.length))
    }
    // null key routes to partition 0
    assert(rows.filter(_.isNullAt(0)).forall(_.getInt(2) == 0))
    // V2 read sees byte-identical content
    val v2 = store.readV2("t").orderBy(col("partition"), col("offset")).collect()
    assert(v2.map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSeq ==
      rows.sortBy(r => (r.getInt(2), r.getLong(3)))
        .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSeq)
  }

  test("appendV2 continues offsets written by the RDD append path, and vice versa") {
    val (store, _) = newStore()
    store.create("t")
    import spark.implicits._
    store.append("t", Seq(("k1", "a"), ("k2", "b")).toDF("key", "value"))
    store.appendV2("t", Seq(("k1", "c")).toDF("key", "value"))
    store.append("t", Seq(("k1", "d")).toDF("key", "value"))
    // k1's messages are one partition, offsets strictly increasing in
    // append order regardless of which path wrote them
    val k1 = store.readAll("t").filter(col("key") === "k1")
      .orderBy(col("offset")).collect()
    assert(k1.map(_.getString(1)).toSeq == Seq("a", "c", "d"))
    assert(k1.map(_.getLong(3)).toSeq == k1.map(_.getLong(3)).toSeq.sorted)
    assert(k1.map(_.getInt(2)).distinct.length == 1)
    // compacted read keeps the V2-aware latest state
    val last = store.readCompacted("t").filter(col("key") === "k1").collect()
    assert(last.map(_.getString(1)).toSeq == Seq("d"))
  }

  test("appendV2 honors the seq column: offsets follow the caller's sequence per key") {
    val (store, _) = newStore(parts = 1)
    store.create("t")
    import spark.implicits._
    // deliberately shuffled input order; seq defines the lifecycle order
    val kv = Seq(("ccd", "active", 2L), ("ccd", "preparing", 0L), ("ccd", "seeding", 1L))
      .toDF("key", "value", "seq")
      .repartition(3) // multiple input partitions: arrival order is NOT seq order
    store.appendV2("t", kv)
    val vals = store.readAll("t").orderBy(col("offset")).collect().map(_.getString(1))
    assert(vals.toSeq == Seq("preparing", "seeding", "active"))
    // compaction (keyed max-offset) lands on the lifecycle's final state
    assert(store.readCompacted("t").collect().map(_.getString(1)).toSeq == Seq("active"))
  }

  test("compaction works on a V2-written topic") {
    val (store, _) = newStore()
    store.create("t")
    import spark.implicits._
    (1 to 3).foreach { i =>
      store.appendV2("t", Seq(("k1", s"v$i"), ("k2", s"w$i")).toDF("key", "value"))
    }
    store.compact("t")
    val rows = store.readAll("t").collect()
    assert(rows.length == 2) // one live message per key
    assert(rows.map(r => r.getString(0) -> r.getString(1)).toMap ==
      Map("k1" -> "v3", "k2" -> "w3"))
  }

  test("streaming write: epochs produce per-key monotone offsets, compaction converges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (store, _) = newStore()
    store.create("t")
    // seed via batch first: streaming offsets must sort after these
    import spark.implicits._
    store.appendV2("t", Seq(("k1", "batch0")).toDF("key", "value"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = store.writeStreamV2("t", in.toDF().toDF("key", "value"),
      Files.createTempDirectory("graft-v2-ckpt").toString)
    try {
      in.addData(("k1", "e0"), ("k2", "x0"))
      q.processAllAvailable()
      in.addData(("k1", "e1"))
      q.processAllAvailable()
    } finally q.stop()
    val k1 = store.readAll("t").filter(col("key") === "k1")
      .orderBy(col("offset")).collect()
    assert(k1.map(_.getString(1)).toSeq == Seq("batch0", "e0", "e1"),
      "offset order must follow produce order across batch + epochs")
    // keyed compaction lands on the last epoch's state
    val last = store.readCompacted("t").filter(col("key") === "k1").collect()
    assert(last.map(_.getString(1)).toSeq == Seq("e1"))
  }

  test("streaming write restart: recomputed base keeps offsets monotone; compaction converges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (store, _) = newStore()
    store.create("t")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    val in1 = MemoryStream[(String, String)]
    val q1 = store.writeStreamV2("t", in1.toDF().toDF("key", "value"), ckpt)
    try {
      in1.addData(("k1", "run1-e0"))
      q1.processAllAvailable()
    } finally q1.stop()
    // second run, SAME checkpoint: a fresh StreamingWrite instance
    // recomputes its base from the log including run 1's writes, so
    // run 2's offsets must sort strictly after run 1's
    val in2 = MemoryStream[(String, String)]
    // the checkpoint already committed through run 1's offset, so the
    // fresh MemoryStream's first block occupies an already-processed
    // slot — burn it, then produce the real run-2 data
    in2.addData(("k1", "replay-slot"))
    val q2 = store.writeStreamV2("t", in2.toDF().toDF("key", "value"), ckpt)
    try {
      in2.addData(("k1", "run2-e0"), ("k2", "other"))
      q2.processAllAvailable()
    } finally q2.stop()
    val k1 = store.readAll("t").filter(col("key") === "k1")
      .orderBy(col("offset")).collect().map(_.getString(1))
    assert(k1.toSeq == Seq("run1-e0", "run2-e0"),
      "offsets across a checkpoint restart must preserve produce order")
    assert(store.readCompacted("t").filter(col("key") === "k1")
      .collect().map(_.getString(1)).toSeq == Seq("run2-e0"),
      "keyed compaction must land on the post-restart state")
  }

  test("V2 topic-to-topic relay: stream-read source, transform, stream-write sink") {
    // the full connector loop (Kafka-Streams shape): micro-batch tail of
    // topic A (file-set offsets) → transform → STREAMING_WRITE into topic B
    val (store, root) = newStore()
    store.create("a")
    store.create("b")
    import spark.implicits._
    store.appendV2("a", Seq(("k1", "1"), ("k2", "2")).toDF("key", "value"))
    val in = spark.readStream
      .format(classOf[graft.engine.sources.TopicSource].getName)
      .load(java.nio.file.Paths.get(root, "a").toString)
      .select(col("key"), concat(lit("relayed:"), col("value")).as("value"))
    val q = store.writeStreamV2("b", in,
      Files.createTempDirectory("graft-relay-ckpt").toString)
    try {
      q.processAllAvailable()
      store.appendV2("a", Seq(("k1", "3")).toDF("key", "value"))
      q.processAllAvailable()
    } finally q.stop()
    val out = store.readCompacted("b").filter(col("key").isNotNull).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("k1" -> "relayed:3", "k2" -> "relayed:2"),
      "relay must deliver every message exactly once per key with last-state wins")
  }

  test("raw V2 write with a LongType partition column cannot corrupt offsets") {
    // the analyzer's store-assignment inserts a checked LONG→INT cast
    // before the connector sees the rows, so the raw path routes
    // correctly rather than reading half a long's UnsafeRow bytes; a
    // caller that BYPASSES analysis is stopped by the builder's own
    // type check (TopicWriteBuilderSpec) — either way, never corruption
    val (store, root) = newStore()
    store.create("t")
    import spark.implicits._
    val widened = Seq(("k", "v", 0L, 0L, new java.sql.Timestamp(0L)))
      .toDF("key", "value", "partition", "offset", "ts") // partition: LONG
    widened.write.format(classOf[graft.engine.sources.TopicSource].getName)
      .mode("append").save(java.nio.file.Paths.get(root, "t").toString)
    val rows = store.readAll("t").collect()
    assert(rows.length == 1 && rows.head.getInt(2) == 0 &&
      rows.head.getLong(3) == 0L,
      "the cast row must land exactly where an IntegerType one would")
  }

  test("no staging files survive a committed append") {
    val (store, root) = newStore()
    store.create("t")
    import spark.implicits._
    store.appendV2("t", Seq(("a", "1")).toDF("key", "value"))
    val ls = Files.list(java.nio.file.Paths.get(root, "t"))
    try {
      val names = ls.iterator()
      val bad = scala.jdk.CollectionConverters.IteratorHasAsScala(names).asScala
        .map(_.getFileName.toString).filter(_.startsWith(".staging")).toList
      assert(bad.isEmpty, s"staging leftovers: $bad")
    } finally ls.close()
  }
}
