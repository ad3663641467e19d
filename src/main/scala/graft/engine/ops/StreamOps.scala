package graft.engine.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables

/** Streaming-semantic queries run in batch mode (SURVEY.md §2.B
  * "streaming-as-batch"). Each uses the exact Structured Streaming
  * primitive (`window`, `session_window`, watermark arithmetic) so the
  * same expression tree runs under `readStream` unchanged — the batch
  * form exists because it is DuckDB-oracle-checkable, and the streaming
  * form is exercised by ScalaTest (graft.engine.streaming).
  *
  * Window starts are emitted as epoch-second BIGINTs (not timestamps) so
  * the cross-engine compare is free of timestamp-unit ambiguity; events
  * timestamps carry microsecond precision (driver data), and both
  * engines floor to seconds identically.
  *
  * Scale: all four are single-shuffle grouped aggregations with map-side
  * partial aggregation; the session window additionally sorts within the
  * user partition (Spark plans session_window as a sort-based
  * aggregation per group) — at 100 TB this is the standard
  * sessionization shape, partitioned by user.
  */
object StreamOps {
  type Q = (SparkSession, String) => DataFrame
  private val dec = DecimalType(18, 2)

  /** Events per 1-hour tumbling window per type. */
  val streamTumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(dec)).cast("double").as("sum_value"))
      .select($"w.start".cast("timestamp").cast("long").as("w_start"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"w_start", $"event_type")

  /** 1-hour window sliding every 30 minutes — each event lands in
    * exactly two windows. */
  val streamSliding: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".cast("timestamp").cast("long").as("w_start"),
        $"event_type", $"n")
      .orderBy($"w_start", $"event_type")

  /** Per-user session windows with a 30-minute inactivity gap.
    * Session end = last event + gap (Spark session_window semantics;
    * the oracle reproduces it with lag + running-sum sessionization). */
  val streamSession: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"user_id",
        $"w.start".cast("timestamp").cast("long").as("session_start"),
        $"w.end".cast("timestamp").cast("long").as("session_end"), $"n")
      .orderBy($"user_id", $"session_start")

  /** Watermark analog: keep only events within 1 hour of the max
    * timestamp (what a `withWatermark("ts", "1 hour")` stream would
    * still accept at end-of-input). The max is a broadcast scalar —
    * one pass for the max, one filtered scan, no shuffle of the data. */
  val streamLate: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val mx = ev.agg(max($"ts").as("max_ts"))
    ev.crossJoin(broadcast(mx))
      .filter($"ts" >= $"max_ts" - expr("INTERVAL 1 HOUR"))
      .select($"event_id", $"user_id", $"event_type")
      .orderBy($"event_id")
  }

  val queries: Map[String, Q] = Map(
    "stream_tumbling" -> streamTumbling,
    "stream_sliding" -> streamSliding,
    "stream_session" -> streamSession,
    "stream_late" -> streamLate,
  )

  val oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS w_start,
        |  event_type, count(1) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "stream_sliding" ->
      """SELECT w0 - off AS w_start, event_type, count(1) AS n
        |FROM (SELECT event_type,
        |        (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 AS w0
        |      FROM events) e,
        |     (SELECT unnest([0, 1800]) AS off) o
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "stream_session" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | s AS (
        |  SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) + 1800 AS session_end,
        |  count(1) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "stream_late" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
        |ORDER BY event_id""".stripMargin,
  )
}
