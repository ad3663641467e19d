package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.plans.logical.{Window, WindowGroupLimit}

import graft.engine.ops.SimOps

/** Surface-wide gate against the single worst window shape at scale: a
  * rank/analytic window with NO partition spec moves every input row to
  * ONE task (Spark's own `WindowExec: No Partition Defined` warning) —
  * correct at test SFs, a guaranteed straggler at 100×. `sim_rrf`
  * shipped exactly that shape for seven rounds before round 12 replaced
  * it with bounded top-k + survivor rank recovery; this gate makes the
  * regression impossible to reintroduce anywhere in the inventory.
  *
  * Scope note: a `Checkpoints.cut` materializes its subtree during
  * query CONSTRUCTION, so windows strictly below a cut are invisible
  * here (they appear as a LogicalRDD). Every current cut input is
  * narrow-column scoring with no window; new cuts keep the burden of
  * that invariant.
  */
class WindowGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("no declared query plans an un-partitioned window") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      val global = plan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
      }
      if (global.isEmpty) None else Some(s"$name (${global.size})")
    }
    assert(offenders.isEmpty,
      s"un-partitioned window(s) — single-task at scale; use partitionBy, " +
        s"orderBy+limit (TakeOrderedAndProject), or the zipWithIndex " +
        s"pattern: ${offenders.mkString(", ")}")
  }

  test("sim_rrf ranks via bounded TakeOrdered, not windows") {
    val p = SimOps.simRrf(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 per ranking must be a per-task O(k) heap")
    assert(!p.contains("Window"), s"sim_rrf must plan NO window at all:\n$p")
  }

  /** Nested-loop joins are quadratic in the sides' sizes, so the ONLY
    * acceptable BroadcastNestedLoopJoin is one whose broadcast side is
    * provably BOUNDED. Family specs already pin the dedup/pipeline/
    * band families loop-free; this is the surface-wide version with
    * the bounded sanctioned set spelled out (every entry audited to
    * its crossJoin(broadcast(...)) site), so a new unbounded loop
    * join anywhere in the inventory fails loudly instead of riding to
    * 100 TB. */
  private val boundedBnlj: Set[String] = Set(
    // fixed query-vector block (vec_id < 10/20, ≤ 20 rows broadcast)
    "sim_topk", "sim_range", "sim_multiprobe", "sim_ivf", "sim_ivf_pq",
    "sim_batch_topk", "sim_knn_classify", "sim_ivf_kmeans",
    // ≤ 200-row top-100∪top-100 survivor list (rank recovery)
    "sim_rrf",
    // 1-row (or |groups|-row, group key bounded) broadcast aggregate
    // totals: normalizers, bounds, watermarks
    "agg_linreg", "agg_hll", "agg_histogram", "data_skew_profile",
    "data_zone_prune", "mix_weights", "mix_temperature", "mix_upsample",
    "mix_epochs", "mix_dedup_weights", "pipeline_mix", "text_tfidf",
    "join_tpch_q11", "join_tpch_q22", "stream_late",
    // the declared cross-join operator itself: two fixed-small catalog
    // dims (region × nation) — a cross join of dims IS the query
    "join_cross",
  )

  test("only queries with a provably bounded broadcast side plan a " +
    "BroadcastNestedLoopJoin") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      if (p.contains("BroadcastNestedLoopJoin") && !boundedBnlj.contains(name))
        Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"unsanctioned nested-loop join (quadratic at scale) in: " +
        s"${offenders.sorted.mkString(", ")} — either make it an " +
        "equi-join or prove the broadcast side bounded and whitelist it")
  }

  /** Canary: the gate's detector must actually FIRE on a violating
    * plan (a gate that cannot fail proves nothing — the round-11
    * vacuous-baseline lesson). Build the exact shapes the two gates
    * exist to forbid and assert each detector sees them. */
  test("gate canary: detectors trip on a global window and an " +
    "unbounded loop join") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{row_number, expr}
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, i % 7)).toDF("id", "g")

    val globalWin = df.withColumn("r",
      row_number().over(W.orderBy($"id")))
    val winHits = globalWin.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
      case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
    }
    assert(winHits.nonEmpty,
      "window-gate detector failed to flag a deliberately global window")

    val loop = df.as("a").join(df.as("b"), expr("a.id < b.id"))
    assert(loop.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
      "loop-join-gate detector failed to flag a deliberate theta join")
  }

  /** The per-qid rank ≤ k filters in the sim eval family hold the whole
    * corpus per query inside one window partition UNLESS the optimizer
    * pushes the limit into the shuffle (InferWindowGroupLimit): with
    * the pushdown, each map task forwards only its local top-k per qid.
    * That pushdown IS the family's scale contract — pin it in the plan
    * (previously asserted only for sim_batch_topk's shape, which let
    * the other three drift unguarded; VERDICT r11 item 5). */
  test("sim eval family plans WindowGroupLimit (rank<=k pushed into the shuffle)") {
    Seq(
      "sim_batch_topk" -> SimOps.simBatchTopk,
      "sim_recall" -> SimOps.simRecall,
      "sim_matryoshka" -> SimOps.simMatryoshka,
      "sim_knn_classify" -> SimOps.simKnnClassify,
    ).foreach { case (name, fn) =>
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"$name: rank filter must push a WindowGroupLimit below the window")
    }
  }
}
