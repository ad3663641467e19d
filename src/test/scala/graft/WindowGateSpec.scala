package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Window, WindowGroupLimit}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

import graft.engine.ops.Checkpoints

/** Surface-wide gate against the single worst window shape at scale: a
  * rank/analytic window with NO partition spec moves every input row to
  * ONE task (Spark's own `WindowExec: No Partition Defined` warning) —
  * correct at test SFs, a guaranteed straggler at 100×. `sim_rrf`
  * shipped exactly that shape for seven rounds before round 12 replaced
  * it with bounded top-k + survivor rank recovery; this gate makes the
  * regression impossible to reintroduce anywhere in the inventory.
  *
  * Both gates evaluate [[SharedPlans]] — every query's plan built ONCE,
  * under `spark.graft.noCut=true`, so subtrees below a
  * `Checkpoints.cut` (formerly opaque LogicalRDDs, the gates' declared
  * round-12 blind spot) are walked too. The cut canary below proves
  * the mode difference is real: a global window UNDER a cut is
  * invisible to the default-mode detector and caught in noCut mode.
  */
class WindowGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = SharedPlans.sf

  private def globalWindows(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty => w
      case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
    }

  test("no declared query plans an un-partitioned window (cut subtrees " +
    "included)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val global = globalWindows(SharedPlans.optimized(name))
      if (global.isEmpty) None else Some(s"$name (${global.size})")
    }
    assert(offenders.isEmpty,
      s"un-partitioned window(s) — single-task at scale; use partitionBy, " +
        s"orderBy+limit (TakeOrderedAndProject), or the zipWithIndex " +
        s"pattern: ${offenders.mkString(", ")}")
  }

  test("sim_rrf ranks via bounded TakeOrdered, not windows") {
    val p = SharedPlans.executed("sim_rrf").toString
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 per ranking must be a per-task O(k) heap")
    assert(!p.contains("Window"), s"sim_rrf must plan NO window at all:\n$p")
  }

  // ------------------------------------------------ loop-join gate

  /** Every physical node of `p`, descending through the AQE wrapper
    * (whose `children` is empty — a bare collect would see nothing
    * below it) and into subquery plans. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case _ =>
      Seq(p) ++ (p.children ++ p.subqueries).flatMap(allNodes)
  }

  /** Plan-evidence bound on a BNLJ's broadcast side: somewhere in the
    * build subtree there must be a node that CAPS its cardinality —
    *  - a limit (GlobalLimit / LocalLimit / TakeOrderedAndProject:
    *    the top-k and survivor-list shapes),
    *  - an aggregate (BaseAggregateExec: 1-row totals or per-group
    *    normalizers on enumerable keys — the broadcast is |groups|),
    *  - a literal key filter (attribute-vs-literal comparison or IN,
    *    e.g. `vec_id < 20`, `vec_id = 0`: a fixed key set),
    *  - or a scan of a fixed-cardinality catalog dim (region: 5 rows,
    *    nation: 25 — TPC-H spec constants; join_cross's sides).
    * A whitelisted NAME whose build side silently grows past these
    * shapes now fails the gate instead of riding to 100 TB. */
  private def boundedBuild(j: BroadcastNestedLoopJoinExec): Boolean = {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val build = j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    }
    allNodes(build).exists {
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec => true
      case _: BaseAggregateExec => true
      case f: FilterExec => literalKeyFilter(f.condition)
      case s: FileSourceScanExec =>
        val paths = s.relation.location.rootPaths
        paths.nonEmpty && paths.forall(p =>
          Set("region.parquet", "nation.parquet").contains(p.getName))
      // a literal constant-size range (graph_bfs's 1-row BFS seed):
      // cardinality is static in the plan itself
      case r: org.apache.spark.sql.execution.RangeExec =>
        r.range.numElements <= 1000
      // a driver-local literal table (data_zone_prune's probe list):
      // the rows are embedded in the plan node, cardinality is static
      case l: org.apache.spark.sql.execution.LocalTableScanExec =>
        l.rows.size <= 1000
      case _ => false
    }
  }

  private def literalKeyFilter(c: Expression): Boolean = c.exists {
    case BinaryComparison(_: Attribute, _: Literal) => true
    case BinaryComparison(_: Literal, _: Attribute) => true
    case In(_: Attribute, list) if list.forall(_.isInstanceOf[Literal]) => true
    case _: InSet => true
    case _ => false
  }

  private def bnljs(name: String): Seq[BroadcastNestedLoopJoinExec] =
    allNodes(SharedPlans.executed(name)).collect {
      case j: BroadcastNestedLoopJoinExec => j
    }

  /** Nested-loop joins are quadratic in the sides' sizes, so the ONLY
    * acceptable BroadcastNestedLoopJoin is one whose broadcast side is
    * provably BOUNDED. The sanctioned set below is the AUDITED names;
    * the structural test after it holds each sanctioned plan to the
    * [[boundedBuild]] evidence, so the whitelist is no longer
    * name-trust. noCut mode surfaces the BNLJs below cuts too (e.g.
    * sim_rrf's scored pass, invisible to the round-12 gate). */
  private val boundedBnlj: Set[String] = Set(
    // fixed query-vector block (vec_id < 10/20, ≤ 20 rows broadcast) —
    // sim_recall and sim_matryoshka's blocks sat below their scored-
    // pass cut and were invisible to the round-12 gate; noCut mode
    // surfaced them (same audited shape as the rest of the family)
    "sim_topk", "sim_range", "sim_multiprobe", "sim_ivf", "sim_ivf_pq",
    "sim_batch_topk", "sim_knn_classify", "sim_ivf_kmeans",
    "sim_recall", "sim_matryoshka",
    // literal 1-row BFS seed: the root-node frame is range(1) with
    // constant columns, and the optimizer folds the frontier equi-key
    // to a literal predicate, degenerating iteration 1's hash join
    // into a loop join over a 1-row broadcast (below the per-round
    // cuts; surfaced by noCut mode)
    "graph_bfs",
    // remainder-rank allocation: broadcast sides are 1-row aggregate
    // totals below the round-12 de-globalization's cuts
    "mix_budget_alloc",
    // ≤ 200-row top-100∪top-100 survivor list (rank recovery) + the
    // 1-row query-vector broadcast of the scored pass under its cut
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
    "BroadcastNestedLoopJoin (cut subtrees included)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      bnljs(name).nonEmpty && !boundedBnlj.contains(name)
    }
    assert(offenders.isEmpty,
      s"unsanctioned nested-loop join (quadratic at scale) in: " +
        s"${offenders.mkString(", ")} — either make it an " +
        "equi-join or prove the broadcast side bounded and whitelist it")
  }

  test("every sanctioned BroadcastNestedLoopJoin carries structural " +
    "bounded-build-side evidence (whitelist is plan-evidence, not " +
    "name-trust)") {
    val present = boundedBnlj.toSeq.sorted.map(n => n -> bnljs(n))
    // the whitelist must not rot into entries that no longer plan a
    // BNLJ at all (names drifting out silently weakens the canary
    // value of the structural check)
    val stale = present.collect { case (n, js) if js.isEmpty => n }
    assert(stale.isEmpty,
      s"whitelisted but plans no BroadcastNestedLoopJoin (remove): " +
        s"${stale.mkString(", ")}")
    val unbounded = present.flatMap { case (n, js) =>
      js.filterNot(boundedBuild).map(j => s"$n: ${j.simpleStringWithNodeId()}")
    }
    assert(unbounded.isEmpty,
      s"sanctioned queries whose BNLJ build side carries NO bounding " +
        s"node (limit/aggregate/literal-key filter/catalog dim): " +
        s"${unbounded.mkString("; ")}")
  }

  // ------------------------------------------------ broadcast-hint gate

  /** Logical twin of [[boundedBuild]] for the broadcast-HINT gate:
    * somewhere in a hinted subtree there must be a node that caps its
    * cardinality. Estimation/AQE-chosen broadcasts are scale-safe by
    * construction (they only broadcast what the statistics or the
    * runtime sizes say fits); an EXPLICIT hint overrides both forever,
    * so it is only legitimate on a frame whose cardinality is bounded
    * in the plan itself. */
  private def logicalBounded(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def nodes(q: LogicalPlan): Seq[LogicalPlan] =
      Seq(q) ++ q.children.flatMap(nodes)
    nodes(p).exists {
      case _: GlobalLimit | _: LocalLimit => true
      case _: Aggregate | _: Distinct => true
      case f: Filter => literalKeyFilter(f.condition)
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            val ps = h.location.rootPaths
            ps.nonEmpty && ps.forall(pp =>
              Set("region.parquet", "nation.parquet").contains(pp.getName))
          case _ => false
        }
      case r: Range => r.numElements <= 1000
      case l: LocalRelation => l.data.size <= 1000
      case _ => false
    }
  }

  /** (query, hinted-side plans) for every declared query whose
    * optimized plan carries an explicit BROADCAST join hint (the
    * optimizer's EliminateResolvedHint moves `broadcast(df)` into the
    * Join node's JoinHint, so this sees exactly the hand-placed
    * hints, not AQE/estimation decisions; noCut plans include hints
    * below checkpoints). */
  private def hintedSides(name: String)
      : Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join => LJoin}
    SharedPlans.optimized(name).collectWithSubqueries {
      case j: LJoin =>
        j.hint.leftHint.filter(_.strategy.contains(BROADCAST)).map(_ => j.left).toSeq ++
          j.hint.rightHint.filter(_.strategy.contains(BROADCAST)).map(_ => j.right).toSeq
    }.flatten
  }

  test("every explicit broadcast hint sits on a cardinality-bounded " +
    "subtree (cut subtrees included)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val bad = hintedSides(name).filterNot(logicalBounded)
      if (bad.isEmpty) None
      else Some(s"$name (${bad.size} hinted side(s))")
    }
    assert(offenders.isEmpty,
      "an explicit broadcast() hint forces the broadcast at EVERY " +
        "scale — it is only legitimate on a frame the plan itself " +
        "bounds (limit/aggregate/literal-key filter/region-nation " +
        "dim/literal table). Unhint these and let estimation+AQE " +
        s"decide, or bound them: ${offenders.mkString(", ")}")
  }

  test("broadcast-hint canary: the detector trips on a hinted " +
    "unbounded scan") {
    import org.apache.spark.sql.functions.broadcast
    val docs = graft.engine.Tables.documents(spark, sf)
    val bad = docs.as("a").join(
      broadcast(graft.engine.Tables.documents(spark, sf).as("b")),
      org.apache.spark.sql.functions.col("a.doc_id") ===
        org.apache.spark.sql.functions.col("b.doc_id"))
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join => LJoin}
    val sides = bad.queryExecution.optimizedPlan.collectWithSubqueries {
      case j: LJoin =>
        j.hint.leftHint.filter(_.strategy.contains(BROADCAST)).map(_ => j.left).toSeq ++
          j.hint.rightHint.filter(_.strategy.contains(BROADCAST)).map(_ => j.right).toSeq
    }.flatten
    assert(sides.nonEmpty, "canary must surface the hinted side")
    assert(sides.exists(!logicalBounded(_)),
      "a full-corpus hinted scan must be detected as UNBOUNDED — " +
        "detector can no longer fire")
  }

  /** Canary: the gate's detector must actually FIRE on a violating
    * plan (a gate that cannot fail proves nothing — the round-11
    * vacuous-baseline lesson). Build the exact shapes the two gates
    * exist to forbid and assert each detector sees them. */
  test("gate canary: detectors trip on a global window and an " +
    "unbounded loop join") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{broadcast, expr, row_number}
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, i % 7)).toDF("id", "g")

    val globalWin = df.withColumn("r",
      row_number().over(W.orderBy($"id")))
    assert(globalWindows(globalWin.queryExecution.optimizedPlan).nonEmpty,
      "window-gate detector failed to flag a deliberately global window")

    val loop = df.as("a").join(df.as("b"), expr("a.id < b.id"))
    val loopJoins = allNodes(loop.queryExecution.executedPlan).collect {
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(loopJoins.nonEmpty,
      "loop-join-gate detector failed to flag a deliberate theta join")

    // structural-evidence canary: an UNBOUNDED broadcast side (plain
    // scan, no limit/aggregate/literal filter/catalog dim) must fail
    // boundedBuild — so a whitelisted name whose build side loses its
    // bounding node cannot slip through on name-trust
    val big = spark.range(0, 100000).toDF("id")
    val unboundedLoop = df.crossJoin(broadcast(big))
    val ubJoins = allNodes(unboundedLoop.queryExecution.executedPlan)
      .collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(ubJoins.nonEmpty, "canary cross join did not plan a BNLJ")
    assert(ubJoins.forall(j => !boundedBuild(j)),
      "boundedBuild accepted a plain unbounded range scan as a " +
        "broadcast side — the structural evidence check is vacuous")
  }

  /** Cut canary: a global window UNDER a Checkpoints.cut materializes
    * at construction and reaches default-mode plan inspection as a
    * LogicalRDD — the round-12 blind spot. Assert the blindness is
    * real in default mode AND that the noCut mode SharedPlans uses
    * makes the same offender visible — i.e. the surface gates above,
    * which run on noCut plans, genuinely cover what sits below cuts. */
  test("cut canary: a global window below a cut is invisible by " +
    "default and caught in noCut mode") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.row_number
    import spark.implicits._
    def offender() = {
      val base = (1 to 40).map(i => (i.toLong, i % 3)).toDF("id", "g")
      Checkpoints.cut(
          base.withColumn("r", row_number().over(W.orderBy($"id"))))
        .filter($"r" <= 10)
    }
    val blind = SparkTest.confLock.synchronized {
      globalWindows(offender().queryExecution.optimizedPlan)
    }
    assert(blind.isEmpty,
      "expected the default-mode blind spot (window hidden behind the " +
        "cut's LogicalRDD) — if this fires, cut() stopped " +
        "materializing and the noCut machinery is redundant")
    val seen = SparkTest.confLock.synchronized {
      spark.conf.set(Checkpoints.NoCutKey, "true")
      try globalWindows(offender().queryExecution.optimizedPlan)
      finally spark.conf.unset(Checkpoints.NoCutKey)
    }
    assert(seen.nonEmpty,
      "noCut mode failed to surface the global window below the cut — " +
        "the surface gates are NOT covering cut subtrees")
  }

  /** The per-qid rank ≤ k filters in the sim eval family hold the whole
    * corpus per query inside one window partition UNLESS the optimizer
    * pushes the limit into the shuffle (InferWindowGroupLimit): with
    * the pushdown, each map task forwards only its local top-k per qid.
    * That pushdown IS the family's scale contract — pin it in the plan
    * (previously asserted only for sim_batch_topk's shape, which let
    * the other three drift unguarded; VERDICT r11 item 5). */
  test("sim eval family plans WindowGroupLimit (rank<=k pushed into the shuffle)") {
    Seq("sim_batch_topk", "sim_recall", "sim_matryoshka",
        "sim_knn_classify")
      .foreach { name =>
        val p = SharedPlans.executed(name).toString
        assert(p.contains("WindowGroupLimit"),
          s"$name: rank filter must push a WindowGroupLimit below the window")
      }
  }
}
