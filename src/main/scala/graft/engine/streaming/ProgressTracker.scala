package graft.engine.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Live seeding-progress reporting (reference core.clj:158-175): the
  * reference pushes `[seeded total]` onto a sliding-buffer-1 channel —
  * only the newest report survives if the consumer lags, and a report
  * fires at most every 2% of total rows, with the first at 0.
  *
  * [[ProgressTracker]] is the pure core (reportable against any row
  * counter); [[SeedingProgressListener]] wires it to Structured
  * Streaming's `StreamingQueryListener`, whose per-micro-batch
  * `numInputRows` is naturally conflated — at most one event per
  * batch, the direct analog of the reference's sliding buffer.
  */
final class ProgressTracker(total: Long, stepPct: Double = 0.02) {
  private val step = math.max(1L, math.ceil(total * stepPct).toLong)
  // all writes happen under advance's monitor; volatile covers the
  // lock-free read in `current` (an AtomicLong here would just be a
  // second, redundant synchronization mechanism)
  @volatile private var seeded = 0L
  @volatile private var lastReported = -1L

  /** Advance by `rows`; Some((seeded, total)) when a report is due —
    * first report at 0, then whenever ≥ step rows passed since the
    * last report (reference core.clj:162-170). */
  def advance(rows: Long): Option[(Long, Long)] = synchronized {
    seeded += rows
    val cur = seeded
    if (total == 0) None // no reports for empty tables (core_test.clj:226)
    else if (lastReported < 0 || cur - lastReported >= step) {
      lastReported = cur
      Some((cur, total))
    } else None
  }

  def current: Long = seeded
}

/** Publishes seeding progress from a running stream: one (seeded,
  * total) callback per reporting bucket, conflated per micro-batch. */
final class SeedingProgressListener(
    queryName: String,
    total: Long,
    report: ((Long, Long)) => Unit)
  extends StreamingQueryListener {

  private val tracker = new ProgressTracker(total)

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    if (event.name == queryName)
      tracker.advance(0L).foreach(report) // the reference's initial [0 total]

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    if (event.progress.name == queryName)
      tracker.advance(event.progress.numInputRows).foreach(report)

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
