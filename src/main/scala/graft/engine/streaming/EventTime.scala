package graft.engine.streaming

import java.sql.Timestamp

/** The one shared Timestamp→epoch-µs conversion for every streaming
  * state machine. Two traps this spelling avoids, each previously
  * present in at least one per-file copy:
  *
  *  - `ts.getTime` alone truncates to MILLIseconds, so two events one
  *    microsecond apart sort as equal and a state machine can fold
  *    them in the wrong order relative to its full-precision batch
  *    twin (the events table carries µs).
  *  - `getTime / 1000L * 1000000L + getNanos / 1000L` re-derives the
  *    seconds with TRUNCATING division, which is wrong pre-epoch:
  *    for ts = −1 ms (getTime = −1, getNanos = 999 000 000) it yields
  *    +999 000 µs instead of −1 000 µs — a full second off. `getTime`
  *    already carries the millis with the correct floor semantics;
  *    only the sub-millisecond remainder of `getNanos` may be added.
  */
object EventTime {
  def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
}
