package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.Relational6

/** Semantics + plan-shape guards for the sixth relational batch
  * (sessionization, integer PageRank, deterministic shuffle, URL
  * parsing, source interleaving). */
class Relational6Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ts_sessionize partitions every event into dense per-user sessions") {
    val rows = Relational6.tsSessionize(spark, sf).collect()
    val events = engine.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == events,
      "session sizes partition the event log")
    rows.groupBy(_.getLong(0)).foreach { case (_, sess) =>
      val ids = sess.map(_.getLong(1)).sorted.toSeq
      assert(ids == (1L to ids.length), "session ids dense from 1 per user")
    }
    assert(rows.forall(r => r.getLong(5) == r.getLong(4) - r.getLong(3)
      && r.getLong(5) >= 0L))
  }

  test("ts_sessionize plans ONE data exchange (windows + aggregate share user hash)") {
    val df = Relational6.tsSessionize(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    // AQE's toString repeats the plan under "== Initial Plan ==" —
    // count exchanges in the final plan section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(p).length
    assert(hashExchanges == 1,
      s"lag window, running-sum window and session aggregate must all ride " +
        s"one user_id hash exchange, got $hashExchanges:\n$p")
  }

  test("ts_sessionize consecutive sessions of one user are >24h apart") {
    val byUser = Relational6.tsSessionize(spark, sf).collect()
      .groupBy(_.getLong(0)).values
    byUser.foreach { sess =>
      sess.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) - a.getLong(4) > 86400000000L,
            "gap between sessions exceeds the threshold")
        case _ =>
      }
    }
  }

  test("graph_pagerank conserves bounded integer mass and beats the floor") {
    val rows = Relational6.graphPagerank(spark, sf).collect()
    assert(rows.length == 20)
    val prs = rows.map(_.getLong(1))
    assert(prs.forall(_ >= 150000L), "damped floor")
    assert(prs.sorted.reverse.toSeq == prs.toSeq, "sorted by rank desc")
    // suppliers (odd ids) aggregate many parts' mass — the top of the
    // ranking must be supplier nodes on this bipartite degree profile
    assert(rows.take(5).forall(_.getLong(0) % 2 == 1))
  }

  test("graph_pagerank is run-to-run deterministic (integer arithmetic)") {
    val a = Relational6.graphPagerank(spark, sf).collect().toSeq
    val b = Relational6.graphPagerank(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("data_shuffle emits a permutation with balanced round-robin shards") {
    val rows = Relational6.dataShuffle(spark, sf).collect()
    val n = rows.length.toLong
    assert(rows.map(_.getLong(2)).sorted.toSeq == (0L until n),
      "pos is a dense permutation")
    assert(rows.forall(r => r.getLong(3) == r.getLong(2) % 8))
    val hs = rows.sortBy(_.getLong(2)).map(_.getString(1)).toSeq
    assert(hs == hs.sorted, "global order follows the hash key")
  }

  test("data_shuffle has no global single-partition window") {
    val p = plan(Relational6.dataShuffle(spark, sf))
    assert(!p.contains("Window [row_number()") || p.contains("pid"),
      "row_number must be partitioned (zipWithIndex pattern)")
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning")
      || p.contains("REPARTITION_BY_RANGE"),
      "global order comes from a range exchange")
  }

  test("fn_url decomposes host/path/param consistently") {
    val rows = Relational6.fnUrl(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val url = r.getString(1)
      assert(r.getString(2) == url.stripPrefix("https://").takeWhile(_ != '/'),
        "host")
      assert(url.contains(r.getString(3) + "?"), "path precedes query")
      assert(r.getString(4) == "r" + (r.getLong(0) % 7), "ref param value")
    }
  }

  test("dedup_url canonicalization strips all synthesized noise") {
    val rows = Relational6.dedupUrl(spark, sf).collect()
    val docs = engine.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == docs,
      "variant counts partition the corpus")
    rows.map(_.getString(0)).foreach { canon =>
      assert(canon == canon.toLowerCase, "case noise gone")
      assert(!canon.contains("utm_"), "tracking params gone")
      assert(!canon.contains("/?") && !canon.endsWith("/"),
        "trailing slash gone")
    }
    assert(rows.exists(_.getLong(1) > 1), "dedup actually merged variants")
  }

  test("ts_interp preserves observations and bounds interpolations") {
    val obs = engine.Tables.events(spark, sf)
      .select(col("event_id"),
        floor(col("value") * 1000000).cast("long").as("vi"))
      .filter(col("event_id") % 3 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Relational6.tsInterp(spark, sf).collect()
    assert(rows.length == engine.Tables.events(spark, sf).count())
    rows.foreach { r =>
      val (id, v) = (r.getLong(1), r.getLong(2))
      obs.get(id).foreach(expect =>
        assert(v == expect, s"observed row $id must pass through"))
    }
    val all = obs.values
    assert(rows.forall(r =>
      r.getLong(2) >= all.min && r.getLong(2) <= all.max),
      "interpolations stay inside the observed envelope")
  }

  test("tok_vocab_coverage counts are consistent basis points") {
    val rows = Relational6.tokVocabCoverage(spark, sf).collect()
    assert(rows.forall { r =>
      val (n, v, cov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      v <= n && cov == v * 10000 / n && cov >= 0 && cov <= 10000
    })
    assert(rows.map(_.getLong(3)).distinct.length > 1,
      "vocab of 10 over a 31-token corpus must discriminate docs")
  }

  test("agg_linreg integer slope agrees with a float least-squares fit") {
    val got = engine.ops.Relational6.aggLinreg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val pts = engine.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000").cast("double"),
        col("value"))
      .collect().groupBy(_.getString(0))
    val minH = pts.values.flatten.map(_.getDouble(1)).min
    pts.foreach { case (et, rs) =>
      val xs = rs.map(_.getDouble(1) - minH)
      val ys = rs.map(_.getDouble(2) * 1e6)
      val n = rs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val slope = (n * xs.zip(ys).map { case (a, b) => a * b }.sum - sx * sy) /
        (n * xs.map(x => x * x).sum - sx * sx)
      assert(math.abs(got(et) - slope * 1e6) <= math.abs(slope * 1e6) * 1e-6 + 2,
        s"$et: integer slope ${got(et)} vs float ${slope * 1e6}")
    }
  }

  test("pack_windows tiles every token run with stride-16 windows") {
    val rows = engine.ops.Relational6.packWindows(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, ws) =>
      val sorted = ws.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length),
        "window indices dense")
      assert(sorted.forall(r => r.getLong(2) == r.getLong(1) * 16))
      assert(sorted.forall(r => r.getLong(3) <= 32))
      val end = sorted.map(r => r.getLong(2) + r.getLong(3)).max
      // the last window must reach the end of the doc and no window
      // may start at or beyond it
      assert(sorted.last.getLong(2) + sorted.last.getLong(3) == end)
      assert(sorted.forall(_.getLong(2) < math.max(end, 1)))
      // consecutive windows overlap by 16 (stride < window)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) < a.getLong(2) + a.getLong(3),
            "windows overlap — no token gap between chunks")
        case _ =>
      }
    }
  }

  test("graph_bfs levels match digit-tree distances") {
    val rows = engine.ops.Relational6.graphBfs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(123L) == 0L)
    assert(rows(12L) == 1L, "parent one hop up")
    assert(rows(120L) == 2L, "sibling via parent")
    assert(rows(1L) == 2L)
    assert(rows(19L) == 3L, "uncle via grandparent")
    assert(rows.values.forall(d => d >= 0 && d <= 6))
    // hop distance in the digit forest = hops up to the common
    // ancestor + hops down; spot-check a 4-hop node
    assert(rows(190L) == 4L)
    assert(!rows.contains(2L), "other roots are unreachable (disjoint trees)")
  }

  test("agg_quantiles rows are monotone within each group") {
    val rows = engine.ops.Relational6.aggQuantiles(spark, sf).collect()
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L to 3L), "four cut points")
      val vs = sorted.map(_.getDouble(2))
      assert(vs.zip(vs.tail).forall { case (a, b) => a <= b },
        "p25 <= p50 <= p75 <= p90")
    }
  }

  test("the (group, pid) extent table of a (g, v) range partition is " +
    "bounded by |groups| + #partitions at every partition count") {
    // agg_quantiles' driver-side extent collect claims this bound "by
    // construction" (each range partition holds a contiguous (g, v)
    // run, so it meets at most 2 group boundaries); pin the claim on
    // skewed frames where one group dominates and groups straddle
    // every boundary
    import spark.implicits._
    for (parts <- Seq(2, 7, 32)) {
      SparkTest.confLock.synchronized {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        spark.conf.set("spark.sql.adaptive.enabled", "false") // keep the
        // requested width: AQE would coalesce the tiny shuffle and
        // trivialize the bound
        try {
          val df = spark.range(5000)
            .select(
              when($"id" < 4000, lit("hot")) // 80% one group
                .otherwise(concat(lit("g"), ($"id" % 13).cast("string")))
                .as("g"),
              ($"id" * 37 % 991).cast("double").as("v"))
          val ext = df.repartitionByRange($"g", $"v")
            .select($"g", org.apache.spark.sql.functions
              .spark_partition_id().as("pid"))
            .distinct().collect()
          val groups = ext.map(_.getString(0)).distinct.length
          val pids = ext.map(_.getInt(1)).distinct.length
          assert(ext.length <= groups + pids,
            s"extent rows ${ext.length} > |groups| $groups + " +
              s"#partitions $pids at $parts shuffle partitions")
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", "4")
          spark.conf.unset("spark.sql.adaptive.enabled")
        }
      }
    }
  }

  test("dedup_fuzzy pairs stay within blocks and the distance bound") {
    val rows = engine.ops.Relational6.dedupFuzzy(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "canonical pair order")
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 15))
    // every emitted pair must share the block key (lang, 12-char prefix)
    val heads = engine.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        substring(engine.ops.TextFeatures.normText(col("text")), 1, 12))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows.forall(r => heads(r.getLong(0)) == heads(r.getLong(1))))
  }

  test("dedup_containment dominates Jaccard on shared pairs") {
    val cont = engine.ops.DedupOps.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cont.values.forall(c => c >= 8000 && c <= 10000))
    val jac = engine.ops.DedupOps.dedupNear(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = cont.keySet.intersect(jac.keySet)
    assert(shared.nonEmpty, "families overlap on strong dups")
    shared.foreach { k =>
      assert(cont(k) + 1 >= math.floor(jac(k) * 10000),
        s"containment must dominate Jaccard for $k")
    }
  }

  test("win_running_distinct is monotone and ends at the distinct count") {
    val rows = engine.ops.Relational6.winRunningDistinct(spark, sf).collect()
    val expect = engine.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val seen = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(seen.head == 1L && seen.last == expect(u))
      assert(seen.zip(seen.tail).forall { case (a, b) => b == a || b == a + 1 },
        "running distinct grows by at most one per event")
    }
  }

  test("join_interval_overlap plans an equi-join, never a loop join") {
    val df = engine.ops.Relational6.joinIntervalOverlap(spark, sf)
    val rows = df.collect()
    assert(rows.forall(_.getLong(2) >= 0L), "overlap length non-negative")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "canonical pairs")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      "bucketed decomposition must keep the overlap join an equi-join")
  }

  test("agg_gini is bounded and agrees with a direct computation") {
    val rows = engine.ops.Relational6.aggGini(spark, sf).collect()
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 1000000))
    val xs = engine.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val v = xs(r.getString(0)).map(_.getLong(1)).sorted
      val n = v.length.toLong
      val sx = v.sum
      val six = v.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      assert(r.getLong(2) == (2 * six - (n + 1) * sx) * 1000000L / (n * sx))
    }
  }

  test("agg_gini's rank-weighted formula is exact past the BIGINT-product " +
    "range (a 100 TB corpus's per-source doc counts)") {
    // Σi·x overflows BIGINT once n·x̄·n/2 passes ~9e18 (~1e7 docs per
    // source at 1e5-char documents) — the decimal spelling must keep
    // computing the true coefficient, checked against BigInt math on
    // aggregates synthesized at corpus scale
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // (n docs, per-doc char count): past-overflow scales with skew so
    // gini is non-trivial — one giant doc atop n-1 uniform ones
    Seq((20000000L, 100000L), (1000000000L, 30000L)).foreach {
      case (n, x) =>
        val big = 50L * x // the giant doc, rank n (largest)
        val sx = BigInt(x) * (n - 1) + big
        // uniform docs occupy ranks 1..n-1: Σi·x = x·(n-1)n/2, + big·n
        val six = BigInt(x) * (BigInt(n - 1) * n / 2) + BigInt(big) * n
        val exp = (((2 * six - (BigInt(n) + 1) * sx) * 1000000) /
          (BigInt(n) * sx)).toLong
        val got = Seq((n, sx.toString, six.toString)).toDF("n", "sxs", "sixs")
          .select($"n", $"sxs".cast(dec).as("sx"), $"sixs".cast(dec).as("six"))
          .select(expr(engine.ops.Relational6.GiniE6Expr).as("gini_e6"))
          .head().getLong(0)
        assert(got == exp,
          s"n=$n: decimal gini $got != BigInt reference $exp")
        assert(exp >= 0 && exp < 1000000, "canary itself must be in range")
    }
  }

  test("text_ttr invariants: types <= tokens, hapax <= types, ratios bounded") {
    val rows = engine.ops.Relational6.textTtr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ty, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ty <= n && h <= ty)
      assert(r.getLong(4) == ty * 10000 / n && r.getLong(5) == h * 10000 / n)
    }
  }

  test("join_star: broadcast dims, positive revenue, lineitem rows conserved") {
    val df = Relational6.joinStar(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getLong(3) > 0)
    }
    val joined = rows.map(_.getLong(3)).sum
    val total = engine.Tables.lineitem(spark, sf).count()
    assert(joined <= total, "star join never multiplies fact rows")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims join broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("agg_salted equals the direct one-stage aggregate, split across salts") {
    val salted = Relational6.aggSalted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val direct = engine.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast(dec)).cast("double").as("q"))
      .orderBy($"l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == direct, "salting must be invisible in the result")
    // stage 1 really splits: >1 salt bucket per flag on this data
    val buckets = engine.Tables.lineitem(spark, sf)
      .withColumn("salt",
        pmod(hash($"l_orderkey", $"l_linenumber", $"l_partkey"), lit(16)))
      .select($"l_returnflag", $"salt").distinct().count()
    assert(buckets > direct.length, "hot keys must spread across salts")
  }

  test("win_cume_dist: cd is a valid distribution, second_low matches a recompute") {
    val rows = Relational6.winCumeDist(spark, sf).collect()
    assert(rows.nonEmpty)
    // cume_dist in (0, 1e6]; exactly one row per partition reaches 1e6
    assert(rows.forall(r => r.getLong(3) > 0 && r.getLong(3) <= 1000000L))
    // second_low: null only on each partition's first row, else the
    // 2nd-smallest (price, key) seen — recompute per partition
    val byPrio = rows.groupBy(_.getString(1))
    byPrio.foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getDouble(2), r.getLong(0)))
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i == 0) assert(r.isNullAt(4))
        else assert(r.getDouble(4) == sorted(1).getDouble(2))
      }
    }
  }

  test("data_interleave prefixes are source-balanced") {
    val rows = Relational6.dataInterleave(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(1))
    bySource.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length),
        "per-source ranks dense from 1")
    }
    // any prefix cut at a full round holds an equal count per source
    // that still has documents at that depth
    val minRounds = bySource.values.map(_.length).min.toLong
    val prefix = rows.filter(_.getLong(2) <= minRounds)
    assert(prefix.groupBy(_.getString(1)).values
      .forall(_.length.toLong == minRounds))
  }
}
