package graft.engine.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the LIVE twin of the
  * batch `stream_join` query (graft.engine.ops.StreamOps.streamJoin:
  * purchases within 1 hour AFTER a click by the same user).
  *
  * This is Spark's `StreamingSymmetricHashJoinExec`: both sides are
  * hash-partitioned on the equi key (user_id) and buffered in keyed
  * state; the time-range condition plus BOTH watermarks bound how long
  * a buffered row can still find a match, so state is evicted as the
  * watermarks advance — O(rows within the interval + lateness), not
  * O(stream). This is the production shape of the "enrich events with
  * recent context" join: at 100 TB/day the state store holds only the
  * interval window, and the shuffle is the same keyed exchange as the
  * batch twin's.
  *
  * The range predicate must reference BOTH event-time columns so the
  * planner can derive each side's state watermark (a join on key alone
  * would buffer forever and is rejected in append mode).
  */
object IntervalJoin {
  final case class Click(user_id: Long, click_id: Long, click_ts: Timestamp)
  final case class Buy(user_id: Long, purchase_id: Long, purchase_ts: Timestamp)

  /** Join purchases to clicks of the same user within
    * `[click_ts, click_ts + interval)`, both sides watermarked by
    * `lateness`. Append-mode-safe: rows emit once their match window
    * is provably closed. */
  def join(clicks: Dataset[Click], buys: Dataset[Buy],
           interval: String = "1 hour", lateness: String = "10 minutes"): DataFrame = {
    StateStores.configure(clicks.sparkSession)
    val c = clicks.withWatermark("click_ts", lateness)
    val b = buys.withWatermark("purchase_ts", lateness)
    c.join(b,
        c("user_id") === b("user_id")
          && b("purchase_ts") >= c("click_ts")
          && b("purchase_ts") < c("click_ts") + expr(s"INTERVAL $interval"),
        "inner")
      .select(c("user_id"), col("click_id"), col("purchase_id"))
  }
}
