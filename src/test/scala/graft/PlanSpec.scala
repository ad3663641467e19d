package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.{DedupOps, Relational}

/** Physical-plan regression guards: the optimizations the engine
  * depends on at scale must stay in the plan — filters pushed into the
  * parquet scan, pruned read schemas, broadcast for small dims,
  * map-side partial aggregation, and no accidental cartesian products
  * anywhere in the inventory. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter_range pushes predicates into the parquet scan, prunes columns") {
    val p = plan(Relational.filterRange(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_discount:double>"), "scan reads only the 4 needed columns")
  }

  test("join_broadcast plans a BroadcastHashJoin with the dim side built") {
    val p = plan(Relational.joinBroadcast(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("BroadcastExchange"))
  }

  test("agg_group aggregates partially before the shuffle") {
    val p = plan(Relational.aggGroup(spark, sf))
    assert(p.contains("partial_sum"), "map-side combine present")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial + final")
  }

  test("scan_count reads zero data columns (footer-count shape)") {
    val p = plan(Relational.scanCount(spark, sf))
    assert(p.contains("ReadSchema: struct<>"))
  }

  test("no query in the inventory plans a CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = plan(fn(spark, sf))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("minhash candidate generation is an equi-join on band keys, not a loop join") {
    val p = plan(DedupOps.dedupMinhash(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("SortMergeJoin")
      || p.contains("HashJoin"),
      "band-key join must be hash/merge (nested-loop would be quadratic)")
  }

  test("join_range_bucket's interval predicate rides a hash equi-join") {
    // the bucketed rewrite exists to avoid the BroadcastNestedLoopJoin a
    // raw interval join plans — regression-guard the equi-join shape
    val p = plan(graft.engine.ops.Relational3.joinRangeBucket(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "band join must stay an equi-join on the bucket")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("round-3 composed queries keep their scale shapes") {
    import graft.engine.ops.PipelineOps
    // pipeline_clean: narrow doc_id joins only — no loop joins anywhere
    val pc = plan(PipelineOps.pipelineClean(spark, sf))
    assert(!pc.contains("BroadcastNestedLoopJoin") && !pc.contains("CartesianProduct"))
    // trained-IVF: candidate probing is a broadcast HASH join on cid (the
    // only nested-loop is the sanctioned 1-row query-vector cross join,
    // same shape as sim_topk/sim_ivf)
    val ik = plan(PipelineOps.simIvfKmeans(spark, sf))
    assert(ik.contains("BroadcastHashJoin"), "probe join must be a hash join on cid")
    assert(!ik.contains("CartesianProduct"))
    // typed top-k UDAF: partial aggregation before the shuffle (O(k)
    // buffers ship, not the corpus)
    val tk = plan(PipelineOps.aggTopkCustom(spark, sf))
    assert(tk.contains("ObjectHashAggregate") || tk.contains("SortAggregate"),
      "typed Aggregator plans an object aggregate")
    assert(tk.toLowerCase.contains("partial_topkaggregator"),
      "partial (map-side) top-k aggregation present")
  }

  test("stream_funnel is one data shuffle: stacked windows + partition-reusing dedup") {
    val p = plan(graft.engine.ops.StreamOps.streamFunnel(spark, sf))
    // exchanges: ONE hash partitioning on user_id for the windows +
    // dedup, plus the final presentation range sort — never a shuffle
    // per funnel stage
    val exchanges = "Exchange (?:hash|range)partitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n$p")
    assert("Window".r.findAllIn(p).size >= 3, "three stacked stage windows")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "funnel stages must not be joins")
  }

  test("dedup family never plans a nested-loop join (quadratic at scale)") {
    // dedup_embed formerly paired via an all-pairs theta join →
    // BroadcastNestedLoopJoin; its IVF-candidate equi-join (and every
    // other dedup operator) must plan hash/merge joins only
    Seq("dedup_embed" -> DedupOps.dedupEmbed,
        "dedup_near" -> DedupOps.dedupNear,
        "dedup_minhash" -> DedupOps.dedupMinhash,
        "dedup_simhash_dup" -> DedupOps.dedupSimhashDup,
        "dedup_clusters" -> DedupOps.dedupClusters).foreach { case (name, fn) =>
      val p = plan(fn(spark, sf))
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name plans a BroadcastNestedLoopJoin")
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  test("Relational15's supply-relation shapes keep dims on broadcasts and " +
    "facts on equi-joins") {
    import graft.engine.ops.Relational15
    // q2: the min-cost join-back is an equi-join on (partkey, cost) —
    // a loop join here would be the correlated subquery Spark didn't
    // decorrelate. (The broadcast dim joins run inside the lineage
    // cut and don't appear in this plan string; q9/q20 assert them.)
    val q2 = plan(Relational15.joinTpchQ2(spark, sf))
    assert(q2.contains("SortMergeJoin") || q2.contains("BroadcastHashJoin") ||
      q2.contains("ShuffledHashJoin"), "q2 join-back must be an equi-join")
    assert(!q2.contains("BroadcastNestedLoopJoin") &&
      !q2.contains("CartesianProduct"), s"q2 plans a loop join")
    // q9: the profit rollup aggregates partially before its shuffle and
    // never loop-joins; supplier/nation/part all broadcast
    val q9 = plan(Relational15.joinTpchQ9(spark, sf))
    assert(q9.contains("BroadcastHashJoin"), "q9 dims must broadcast")
    assert(q9.contains("partial_sum"), "q9 map-side combine present")
    assert(!q9.contains("BroadcastNestedLoopJoin"), "q9 plans a loop join")
    // q20: everything after the supply aggregate is a semi-join moving
    // keys only
    val q20 = plan(Relational15.joinTpchQ20(spark, sf))
    assert("LeftSemi".r.findAllIn(q20).size >= 2,
      s"q20 must stack semi-joins:\n$q20")
    // q11: the single permitted nested-loop is the 1-row broadcast of
    // the global (total, count) — the group-vs-global comparison
    val q11 = plan(Relational15.joinTpchQ11(spark, sf))
    assert(q11.contains("partial_sum"), "q11 map-side combine present")
  }

  test("golden exchange counts for the bench top-10: a plan regression " +
    "fails here, not in next round's drift diff") {
    // Round 18 (verdict item 6): the 10 most expensive BENCH rows get
    // their shuffle count pinned — an accidental extra repartition /
    // lost broadcast in ANY of them silently costs minutes at 100 TB
    // and was previously only caught by tools/drift.py comparing round
    // artifacts after the fact. Counts are Exchange nodes in the
    // pre-AQE executedPlan string at sf0.001 (AQE rewrites happen at
    // run time; the static count is deterministic per plan shape).
    // Iterative queries (kcore, pagerank, clusters) checkpoint-cut
    // their loops, so the count covers the FINAL plan tree — the
    // per-round loop shuffles are pinned by their own specs. If a
    // count changes INTENTIONALLY (a better plan), update the golden
    // with the new number and say why in the commit.
    val golden = Map(
      "dedup_containment" -> (2, true),   // shingle df band + pair group; dim broadcast
      "graph_jaccard" -> (3, true),       // r19: kept is cut (computed once, not
                                          // per self-join side) — the df-cap +
                                          // anti-join shuffles sit behind the
                                          // checkpoint; pair agg + deg joins remain
      "graph_kcore" -> (2, false),        // final survivor agg (loop is behind the cut)
      "dedup_near" -> (2, true),          // band explode + self-equi-join on band keys
      "sim_knn_graph" -> (3, true),       // r19: ivfAssigned is cut (the encode ran
                                          // once per self-join side before) and the
                                          // symmetrization explodes from one pass
                                          // (the union branch re-ran the distinct's
                                          // final agg and needed its own exchange);
                                          // pair distinct + top-k window remain
      "win_range" -> (1, false),          // ONE hash partition reused by the range frame
      "mm_decode" -> (1, false),          // r20: decode cut before the presentation
                                          // sort (the range sampler re-ran the codec);
                                          // the repartition sits behind the checkpoint,
                                          // only the sort exchange remains in the tree
      "dedup_clusters_star" -> (1, false),// final relabel (contraction rounds behind cuts)
      "dedup_clusters" -> (1, false),
      "graph_pagerank" -> (7, true)       // degree/rank joins; dangling-mass 1-row broadcast
    )
    // data exchanges: hash/range/single-partition shuffles (broadcast
    // exchanges asserted separately — they're the CHEAP alternative)
    val exchangeRe = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    // collect every drifted row before failing: a plan change rarely
    // touches one query, and the full picture is the diagnosis
    val drifted = golden.toSeq.sortBy(_._1).flatMap {
      case (name, (wantEx, wantBcast)) =>
        val p = plan(SparkEntry.queries(name)(spark, sf))
        val ex = exchangeRe.findAllIn(p).size
        val bcast = p.contains("BroadcastExchange")
        if (ex == wantEx && bcast == wantBcast) None
        else Some(s"$name: (exchanges=$ex, broadcast=$bcast) != golden " +
          s"($wantEx, $wantBcast)")
    }
    assert(drifted.isEmpty,
      s"plan shapes drifted from golden:\n  ${drifted.mkString("\n  ")}")
  }
}
