package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.Relational4

/** Semantics + plan-shape guards for the fourth relational batch
  * (reshape, lateral, time-series fill, retention, splits, PII,
  * graph analytics). */
class Relational4Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("graph_triangles closure strategy is size-gated: broadcast below the " +
    "knob, shuffle join above, identical counts") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def hintedJoins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined) => j
      }.size
    val key = "spark.graft.triangles.broadcastMaxEdges"
    val broad = Relational4.graphTriangles(spark, sf)
    val nBroad = hintedJoins(broad)
    SparkTest.confLock.synchronized {
      spark.conf.set(key, "0") // every graph is "too big": closure must shuffle
      try {
        val shuf = Relational4.graphTriangles(spark, sf)
        assert(hintedJoins(shuf) == nBroad - 1,
          "the gate must drop exactly the closure join's broadcast hint")
        assert(shuf.collect().toSeq.map(_.toString) ==
          broad.collect().toSeq.map(_.toString),
          "closure strategy must not change the counts")
      } finally spark.conf.unset(key)
    }
  }

  test("agg_unpivot emits one row per (group, metric) with matched values") {
    val wide = Relational4.aggUnpivot(spark, sf).collect()
    val groups = wide.map(_.getString(0)).distinct
    assert(wide.length == groups.length * 3, "3 metrics per group")
    // the unpivoted n_orders metric must equal a direct recount
    import spark.implicits._
    val n = engine.Tables.orders(spark, sf).count().toDouble
    val totalN = wide.filter(_.getString(1) == "n_orders").map(_.getDouble(2)).sum
    assert(totalN == n, "unpivoted n_orders rows sum to the table count")
  }

  test("join_lateral decorrelates the per-row LIMIT into a ranked window, " +
    "and caps each customer at 2 rows") {
    val df = Relational4.joinLateral(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "lateral must not plan a per-row loop join")
    assert(p.contains("row_number") || p.contains("WindowGroupLimit"),
      "per-row LIMIT should decorrelate into a ranked window")
    val perCust = df.groupBy("c_custkey").count().agg(max("count")).head().getLong(0)
    assert(perCust <= 2)
  }

  test("ts_fill spine is hole-free hourly and preserves the event total") {
    val rows = Relational4.tsFill(spark, sf).collect()
    val hrs = rows.map(_.getLong(0))
    assert(hrs.zip(hrs.tail).forall { case (a, b) => b - a == 3600 },
      "consecutive rows are exactly one hour apart (gaps zero-filled)")
    val total = rows.map(_.getLong(1)).sum
    val expected = engine.Tables.events(spark, sf)
      .filter(col("event_type") === "error").count()
    assert(total == expected, "zero-fill must not invent or drop events")
  }

  test("ts_fill probes the hour spine with a broadcast of the counts side") {
    val p = plan(Relational4.tsFill(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "spine join must broadcast, not shuffle")
  }

  test("agg_retention day-0 cohort equals the distinct-user count") {
    val rows = Relational4.aggRetention(spark, sf).collect()
    val day0 = rows.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    val users = engine.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(day0 == users, "every user is active on their own first day")
    assert(rows.forall(_.getLong(1) <= users))
  }

  test("data_split is a map-only deterministic 80/10/10 assignment") {
    val df = Relational4.dataSplit(spark, sf)
    assert(!plan(df).contains("Exchange hashpartitioning"),
      "split assignment must not shuffle")
    val a = df.collect(); val b = Relational4.dataSplit(spark, sf).collect()
    assert(a.sameElements(b), "same ids → same split, run over run")
    assert(a.forall { r =>
      val bucket = r.getLong(1)
      val expect = if (bucket < 80) "train" else if (bucket < 90) "valid" else "test"
      bucket >= 0 && bucket < 100 && r.getString(2) == expect
    })
  }

  test("data_split's bucket formula is exact past the BIGINT-product id " +
    "range (a 100 TB corpus's id space)") {
    // ids above ~3.5e9 overflow doc_id * 2654435761 in BIGINT — the
    // decimal spelling must keep computing the true Knuth-hash bucket
    // (checked against BigInt math) instead of throwing (ANSI) or
    // silently re-bucketing (legacy wrap)
    import spark.implicits._
    val ids = Seq(0L, 3500000000L, 4000000001L, Long.MaxValue / 3, Long.MaxValue)
    val got = ids.toDF("doc_id")
      .select($"doc_id", org.apache.spark.sql.functions.expr(
        "CAST(CAST(doc_id AS DECIMAL(38,0)) * 2654435761" +
          " % 4294967296 % 100 AS BIGINT)").as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val expect = ((BigInt(id) * BigInt(2654435761L)) % BigInt(4294967296L) %
        100).toLong
      assert(got(id) == expect, s"id $id: got ${got(id)}, want $expect")
    }
  }

  test("text_pii redacts the injected contact info on every row") {
    val rows = Relational4.textPii(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) >= 1), "every row's injected email is matched")
    assert(rows.forall(_.getInt(2) >= 1), "every row's injected phone is matched")
    // redaction changed the text: digest differs from the unredacted md5
    val raw = engine.Tables.documents(spark, sf)
      .select(md5(concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com tel 555"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).as("d"))
      .collect().map(_.getString(0)).toSet
    assert(rows.forall(r => !raw.contains(r.getString(3))))
  }

  test("graph_triangles matches a naive id-oriented 3-way join count") {
    import spark.implicits._
    val got = Relational4.graphTriangles(spark, sf).head()
    val li = engine.Tables.lineitem(spark, sf)
      .filter($"l_orderkey" % 4 === 0)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    val e = li.as("a").join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .select($"a.pk".as("u"), $"b.pk".as("v")).distinct().localCheckpoint()
    val naive = e.as("e1")
      .join(e.as("e2"), $"e2.u" === $"e1.v")
      .join(e.as("e3"), $"e3.u" === $"e1.u" && $"e3.v" === $"e2.v")
      .count()
    assert(got.getLong(0) == e.count(), "edge count")
    assert(got.getLong(1) == naive,
      "degree-oriented count must equal the naive canonical count")
  }

  test("graph_triangles closes wedges map-side against a broadcast edge set") {
    val p = plan(Relational4.graphTriangles(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "closure probe must be a broadcast hash join (wedges never shuffle)")
  }

  test("join_bloom prunes the probe scan with a bloom might_contain " +
    "and loses no rows vs the plain join") {
    import spark.implicits._
    val df = Relational4.joinBloom(spark, sf)
    val p = plan(df)
    assert(p.contains("might_contain"), "bloom predicate present in the plan")
    // the bloom filter must sit on the probe side, before the join:
    // the first might_contain occurrence appears under a Filter whose
    // input is the orders scan, not the join output
    val joinIdx = p.indexOf("HashJoin")
    val bloomIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      "filter is below (printed after) the join operator in the tree")
    val plain = engine.Tables.orders(spark, sf)
      .join(engine.Tables.customer(spark, sf)
          .filter($"c_acctbal" < 0 && $"c_mktsegment" === "AUTOMOBILE"),
        $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_custkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")
    assert(df.collect().toSeq == plain.collect().toSeq,
      "bloom prefilter is lossless (false positives die in the join)")
  }

  test("subq_exists decorrelates to the same semi-join shape as join_semi") {
    val p = plan(Relational4.subqExists(spark, sf))
    assert(p.contains("LeftSemi"), "EXISTS must plan a semi join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("join_full preserves both unmatched sides null-padded") {
    import spark.implicits._
    val rows = Relational4.joinFull(spark, sf).collect()
    assert(rows.forall(!_.isNullAt(0)), "coalesced key is never null")
    val leftOnly = rows.count(_.isNullAt(2))
    val total = rows.length
    val custWithOrders = engine.Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    val users = engine.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(total >= math.max(custWithOrders, users), "union of key sets")
    assert(leftOnly > 0, "customers without events survive the full join")
  }

  test("set ALL variants honor multiset semantics against grouped counts") {
    import spark.implicits._
    val a = engine.Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_orderdate").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val b = engine.Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "2-HIGH")
      .groupBy($"o_orderdate").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    Relational4.setIntersectAll(spark, sf).collect().foreach { r =>
      val dt = r.get(0).toString
      assert(r.getLong(1) == math.min(a.getOrElse(dt, 0L), b.getOrElse(dt, 0L)),
        s"intersect-all multiplicity for $dt")
    }
    Relational4.setExceptAll(spark, sf).collect().foreach { r =>
      val dt = r.get(0).toString
      assert(r.getLong(1) == a.getOrElse(dt, 0L) - b.getOrElse(dt, 0L),
        s"except-all multiplicity for $dt")
    }
  }

  test("dedup_paragraph picks survivors with a partial aggregate, not a window") {
    val df = graft.engine.ops.DedupOps.dedupParagraph(spark, sf)
    val p = plan(df)
    assert(p.contains("partial_min"),
      "survivor pick must combine map-side (min(struct), never a window sort)")
    assert(!p.contains("Window"), "no window operator anywhere in the plan")
    // reassembly invariant: kept ≤ total, and at least one doc loses a
    // duplicated chunk somewhere in the corpus
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "corpus contains at least one cross-doc duplicate chunk")
  }

  test("agg_mode picks the highest-count priority with lexicographic ties") {
    val rows = Relational4.aggMode(spark, sf).collect()
    val counts = engine.Tables.orders(spark, sf)
      .join(engine.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count().collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val seg = r.getString(0)
      // max count; among equals the lexicographically smallest priority
      val maxN = counts(seg).map(_.getLong(2)).max
      val want = counts(seg).filter(_.getLong(2) == maxN).map(_.getString(1)).min
      assert(r.getString(1) == want, s"mode for $seg")
      assert(r.getLong(2) == maxN)
    }
  }

  test("sim_range returns exactly the neighbors at/above the basis-point cut") {
    import spark.implicits._
    val rows = graft.engine.ops.SimOps.simRange(spark, sf).collect()
    assert(rows.forall(_.getLong(1) >= 2500L))
    // independent brute force via the declarative fold (graft_dot's
    // bit-parity with this form is property-tested in PropertySpec)
    val dot = "aggregate(zip_with(v, qv, (a, b) -> a * b), 0.0D, (a, x) -> a + x)"
    val ve = engine.Tables.embeddings(spark, sf)
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .select($"vec_id", $"v",
        expr(dot.replace("qv", "v")).as("sq"))
      .withColumn("nrm", sqrt($"sq"))
    val q = ve.filter($"vec_id" === 0).select($"v".as("qv"), $"nrm".as("qn"))
    val expect = ve.filter($"vec_id" =!= 0).crossJoin(q)
      .withColumn("fp", floor(expr(dot) / ($"nrm" * $"qn") * 1e4).cast("long"))
      .filter($"fp" >= 2500)
      .select($"vec_id", $"fp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == expect,
      "range result equals the brute-force set (no false accepts/drops)")
  }
}
