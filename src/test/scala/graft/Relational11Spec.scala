package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.engine.ops.Relational11

/** The Relational11 batch: distributed linear algebra, disjunctive
  * joins, landmark BFS, zone-map pruning. First-principles recompute +
  * plan-shape pins on sf0.001 (value equality vs DuckDB is the
  * driver's oracle gate at sf0.01). */
class Relational11Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("embed_pca_power converges toward the dominant direction") {
    val v = Relational11.embedPcaPower(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v.size == 64)
    // the iterate is max-normalized: some |v_j| == 1e6, none exceed it
    assert(v.values.map(math.abs).max == 1000000L)
    // Rayleigh growth: the returned direction must capture at least as
    // much (uncentered) variance as the all-ones start — the defining
    // property of a power step, checked in exact integer arithmetic
    val x = Tables.embeddings(spark, sf).select(
      expr("transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT))")
        .as("v_mu")).collect().map(_.getSeq[Long](0).toArray)
    def rayleigh(w: Array[Long]): BigInt = {
      // Σ_i (x_i·w)² / (w·w) in BigInt, scale-free comparison via cross
      val num = x.map { xi =>
        val d = BigInt(xi.zip(w).map { case (a, b) => a * b }.sum)
        d * d
      }.sum
      val den = BigInt(w.map(a => a * a).sum)
      num / den
    }
    val ones = Array.fill(64)(1000000L)
    val got = (0 until 64).map(j => v(j.toLong)).toArray
    assert(rayleigh(got) >= rayleigh(ones),
      "power iteration must not decrease the Rayleigh quotient")
  }

  test("join_tpch_q7 keeps only the two nation directions") {
    val rows = Relational11.joinTpchQ7(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "the nation pair must trade in the testdata")
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.subsetOf(Set(
      (Relational11.Q7NationA, Relational11.Q7NationB),
      (Relational11.Q7NationB, Relational11.Q7NationA))))
    assert(rows.forall(_.getLong(4) > 0))
  }

  test("graph_landmarks matches in-memory multi-source BFS") {
    val got = Relational11.graphLandmarks(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val nodes = Tables.part(spark, sf).select("p_partkey")
      .collect().map(_.getLong(0))
    val adj = nodes.filter(_ >= 10).flatMap(p => Seq(p -> p / 10, p / 10 -> p))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val expect = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (lm <- Relational11.Landmarks if nodes.contains(lm)) {
      var frontier = Set(lm); expect((lm, lm)) = 0L
      for (h <- 1 to Relational11.LandmarkHops) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
          .filterNot(n => expect.contains((lm, n)))
        frontier.foreach(n => expect((lm, n)) = h.toLong)
      }
    }
    assert(got == expect.toMap, "distributed BFS must equal the reference")
    // multi-hop frontier must actually advance (forest depth at sf0.001
    // is 2 from single-digit roots — the bound itself binds at larger SFs)
    assert(got.values.max >= 2L
      && got.values.max <= Relational11.LandmarkHops.toLong)
  }

  test("data_zone_prune: hit counts are consistent and pruning happens") {
    val rows = Relational11.dataZonePrune(spark, sf).collect()
    assert(rows.length == Relational11.ZoneProbes)
    rows.foreach { r =>
      val (nb, hb) = (r.getLong(3), r.getLong(4))
      assert(hb >= 0 && hb <= nb)
      assert(r.getLong(6) == (nb - hb) * 10000 / nb)
    }
    // the layout must prune SOMETHING for SOME probe, or the zone map
    // is vacuous
    assert(rows.exists(_.getLong(6) > 0), "no probe pruned any bucket")
  }

  test("embed_pca_power plan: per-iteration aggregate is 64-group map-combined") {
    // the scale claim: the only shuffle of an iteration carries
    // partitions*64 partial rows — assert the aggregate groups on the
    // exploded dimension index, not on vec_id or raw rows
    val x = Tables.embeddings(spark, sf).select(
      expr("transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT))")
        .as("v_mu"))
    val vLit = "array(" + Array.fill(64)("1000000L").mkString(",") + ")"
    val u = x.withColumn("dot", expr(
        s"aggregate(zip_with(v_mu, $vLit, (a, b) -> a * b), 0L, (acc, t) -> acc + t)"))
      .select(posexplode(col("v_mu")).as(Seq("j", "xj")), col("dot"))
      .groupBy(col("j"))
      .agg(sum(col("xj").cast("decimal(38,0)") * col("dot")).as("u"))
    val p = u.queryExecution.executedPlan.toString
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"expected a two-phase hash aggregate, got:\n$p")
    assert(u.collect().length == 64)
  }
}
