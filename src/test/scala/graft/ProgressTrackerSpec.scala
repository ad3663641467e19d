package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.streaming.ProgressTracker

/** Live progress semantics (reference core.clj:158-175,
  * core_test.clj:205-249): first report at 0, ≤ every-2% cadence,
  * monotone, nothing for empty tables, conflation under batching. */
class ProgressTrackerSpec extends AnyFunSuite {

  private def drive(total: Long, batches: Seq[Long]): Seq[(Long, Long)] = {
    val t = new ProgressTracker(total)
    batches.flatMap(t.advance)
  }

  test("first report is [0, total]; final count reaches total") {
    val reports = drive(100, Seq(0L) ++ Seq.fill(100)(1L))
    assert(reports.head == ((0L, 100L)))
    assert(reports.last._1 == 100L)
    assert(reports.size <= 52)
  }

  test("empty table never reports (core_test.clj:226)") {
    assert(drive(0, Seq(0L, 0L, 0L)).isEmpty)
  }

  test("row-at-a-time: ≤50 bucket reports + initial, monotone, 2% apart") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50),
      Prop.forAll(Gen.chooseNum(1L, 5000L)) { total =>
        val reports = drive(total, Seq(0L) ++ Seq.fill(total.toInt)(1L))
        val counts = reports.map(_._1)
        val step = math.max(1L, math.ceil(total * 0.02).toLong)
        counts == counts.sorted &&
          reports.forall(_._2 == total) &&
          counts.size <= 52 &&
          counts.zip(counts.tail).forall { case (a, b) => b - a >= step }
      })
    assert(res.passed, res.status.toString)
  }

  test("batched input conflates: at most one report per batch") {
    val reports = drive(1000, Seq(0L, 500L, 400L, 100L))
    // initial + one per large batch
    assert(reports == Seq((0L, 1000L), (500L, 1000L), (900L, 1000L), (1000L, 1000L)))
  }

  test("listener reports progress from a live stream, conflated per batch") {
    val spark = SparkTest.session
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.engine.streaming.SeedingProgressListener
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new SeedingProgressListener("graft_seed_test", 100L, reports.add)
    spark.streams.addListener(listener)
    try {
      val in = MemoryStream[Long]
      val q = in.toDS().writeStream.format("memory")
        .queryName("graft_seed_test").outputMode("append").start()
      in.addData(1L to 50L: _*); q.processAllAvailable()
      in.addData(51L to 100L: _*); q.processAllAvailable()
      q.stop(); q.awaitTermination()
      // listener delivery is async — wait for the final report
      val deadline = System.nanoTime + 10e9.toLong
      while (reports.size < 2 && System.nanoTime < deadline) Thread.sleep(50)
      val got = reports.toArray(Array.empty[(Long, Long)]).toSeq
      assert(got.contains((50L, 100L)) && got.contains((100L, 100L)),
        s"two conflated batch reports expected, got $got")
    } finally spark.streams.removeListener(listener)
  }
}
