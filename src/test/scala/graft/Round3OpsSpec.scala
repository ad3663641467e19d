package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.engine.ops.{CdcOps, PipelineOps, Relational3}

/** Structural invariants for the round-3 additions: sequence packing,
  * changelog materialization, incremental-aggregate merge, and the
  * histogram. (Cross-engine value equality is the Verify gate's job.) */
class Round3OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("ts_asof_grid: every grid instant carries its user's latest prior event") {
    val rows = Relational3.tsAsofGrid(spark, sf).collect()
    assert(rows.nonEmpty)
    val step = 21600000000L
    rows.foreach { r =>
      assert(r.getLong(1) % step == 0L, "grid instants sit on step boundaries")
      assert(r.getLong(3) <= r.getLong(1), "matched event is at or before the instant")
    }
    // inner as-of over a grid that starts after each user's first event
    // drops nothing: exactly (g1-g0)/step + 1 instants per user
    val spans = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
      .groupBy(col("user_id"))
      .agg(expr(s"(max(us) DIV $step) - (min(us) DIV $step) + 1").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    assert(got == spans, "one output row per user per grid instant")
    // spot-check the as-of pick against a direct window recompute
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.take(50).foreach { r =>
      val best = ev.filter(e => e._1 == r.getLong(0) && e._3 <= r.getLong(1))
        .maxBy(e => (e._3, e._2))
      assert((r.getLong(3), r.getLong(2)) == ((best._3, best._2)),
        s"as-of pick mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("pack_sequences: contiguous global packing, offsets within budget") {
    val rows = PipelineOps.packSequences(spark, sf).collect()
    val b = PipelineOps.PackBudget
    assert(rows.nonEmpty)
    // offsets are in-budget and seq ids never decrease in doc order
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) < b, s"seq_off ${r.getLong(3)}")
      if (r.getLong(1) > 0) assert(r.getLong(4) >= 1, "non-empty doc spans >= 1 seq")
    }
    assert(rows.map(_.getLong(2)).sliding(2).forall(p => p.head <= p.last),
      "seq_id monotone in doc order")
    // the packing is CONTIGUOUS: each doc starts exactly where the
    // previous one ended (cum_before = seq_id * B + seq_off)
    val starts = rows.map(r => r.getLong(2) * b + r.getLong(3))
    val ends = rows.map(r => r.getLong(1)).scanLeft(0L)(_ + _)
    assert(starts.sameElements(ends.init), "no gaps or overlaps in the token layout")
  }

  test("cdc_apply: tombstoned keys vanish, survivors carry their true last event") {
    val out = CdcOps.cdcApply(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val last = Tables.events(spark, sf)
      .select(col("user_id"),
        col("ts").cast("timestamp").cast("double").as("ts_s"), // ntz rows carry LocalDateTime
        col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        val m = rs.maxBy(r => (r.getDouble(1), r.getLong(2)))
        u -> (m.getLong(2), m.getString(3))
      }
    last.foreach { case (u, (eid, typ)) =>
      if (typ == "error") assert(!out.contains(u), s"tombstoned user $u survived")
      else assert(out.get(u).contains(eid), s"user $u wrong last event")
    }
    assert(out.keySet == last.filter(_._2._2 != "error").keySet)
  }

  test("agg_incremental: base+delta merge equals the full recompute") {
    import org.apache.spark.sql.types.DecimalType
    val merged = Relational3.aggIncremental(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val full = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("s"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(merged.sameElements(full), "partial-aggregate merge must be lossless")
  }

  test("agg_histogram: bins cover [0,19] and counts sum to the table size") {
    val rows = Relational3.aggHistogram(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(rows.forall { case (b, _) => b >= 0 && b <= 19 })
    assert(rows.map(_._2).sum == Tables.events(spark, sf).count())
    // the max value lands in the top bin (the least(19, _) edge fold)
    assert(rows.exists(_._1 == 19), "max value must fold into bin 19")
  }

  test("pack_sequences plans a partitioned window, never a global one") {
    val p = PipelineOps.packSequences(spark, sf)
      .queryExecution.executedPlan.toString
    // a Window with an empty partition spec drags the corpus through one
    // task — the exact shape the distributed cumsum exists to avoid
    assert(!p.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      "global (unpartitioned) Window in the plan")
  }
}
