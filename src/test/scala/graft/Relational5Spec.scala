package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.Relational5

/** Semantics + plan-shape guards for the fifth relational batch
  * (recursive CTE, upsampling, OHLC resample, boolean aggregates,
  * multi-distinct). */
class Relational5Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("graph_hierarchy covers every part exactly once across the forest") {
    val rows = Relational5.graphHierarchy(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L), "one row per root")
    val total = rows.map(_.getLong(1)).sum
    val parts = engine.Tables.part(spark, sf).count()
    assert(total == parts,
      "each part lies on exactly one root chain — subtree counts partition the table")
    // the digit-tree invariant: root 0 has no children (no partkey >= 10
    // divides down to 0), so its subtree is itself
    assert(rows.find(_.getLong(0) == 0L).get.getLong(1) == 1L)
  }

  test("graph_hierarchy sum_size matches a direct first-digit rollup") {
    val got = Relational5.graphHierarchy(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // root of p = first digit of p (repeated DIV 10 until < 10)
    val expect = engine.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_size"))
      .collect()
      .groupBy { r =>
        var n = r.getLong(0); while (n >= 10) n /= 10; n
      }
      .map { case (root, rs) => root -> rs.map(_.getInt(1).toLong).sum }
    assert(got == expect)
  }

  test("mix_upsample replicates each doc by its language factor, bounded 1..4") {
    val rows = Relational5.mixUpsample(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall { copies =>
      val n = copies.length
      n >= 1 && n <= 4 && copies.map(_.getLong(2)).sorted.toSeq == (1L to n)
    }, "copies are dense 1..repeats per doc")
    // all docs of one language share one factor
    assert(byDoc.toSeq.groupBy(_._2.head.getString(1))
      .values.forall(docs => docs.map(_._2.length).distinct.size == 1))
  }

  test("mix_upsample broadcasts the factor table (corpus never shuffled for the join)") {
    val p = plan(Relational5.mixUpsample(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "factor join must broadcast")
  }

  test("ts_ohlc bars are internally consistent") {
    val rows = Relational5.tsOhlc(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (open, high, low, close) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      low <= open && open <= high && low <= close && close <= high
    }, "open/close lie within [low, high]")
    val n = rows.map(_.getLong(6)).sum
    assert(n == engine.Tables.events(spark, sf).count(),
      "bar volumes partition the event count")
  }

  test("ts_ohlc plans ONE exchange: all window functions share the bar partitioning") {
    val p = plan(Relational5.tsOhlc(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in:\n$p")
  }

  test("agg_bool matches direct predicate counts") {
    val rows = Relational5.aggBool(spark, sf).collect()
    val ev = engine.Tables.events(spark, sf)
    val expect = ev.filter(col("value") > 50).count()
    assert(rows.map(_.getLong(3)).sum == expect, "count_if sums to the direct filter")
  }

  test("agg_multi_distinct plans per-column distinct aggregates (no Expand) and matches") {
    val df = Relational5.aggMultiDistinct(spark, sf)
    // r20: the join-of-distinct-aggregates spelling replaced the
    // Expand-based multi-distinct (Expand fanned every input row out
    // once per distinct group — 4x rows through the first aggregate;
    // measured -29% isolated). Pin the NEW shape: no Expand, and the
    // group-column joins stay broadcast.
    assert(!plan(df).contains("Expand"),
      "multi-distinct should plan per-column distinct aggregates, not Expand")
    assert(plan(df).contains("BroadcastHashJoin"),
      "the returnflag joins should broadcast")
    val r = df.collect()
    val direct = engine.Tables.lineitem(spark, sf)
      .select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(r.map(_.getLong(1)).max <= direct)
    assert(r.map(_.getLong(4)).sum == engine.Tables.lineitem(spark, sf).count())
  }
}
