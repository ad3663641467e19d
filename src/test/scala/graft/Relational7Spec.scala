package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.{DedupOps, Relational7, TextOps}

/** Semantics + plan-shape guards for the round-5 batch: integer EWMA,
  * neighbor-Jaccard link scores, peak-preserving downsampling,
  * diversity profiling, substring-duplication fractions, and the
  * Gopher quality rules. */
class Relational7Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("win_ewma covers every event; a user's first sample is its own EWMA") {
    val rows = Relational7.winEwma(spark, sf).collect()
    val events = engine.Tables.events(spark, sf).count()
    assert(rows.length == events)
    // per user, the earliest event (no lags) must have ewma == v
    val first = rows.groupBy(_.getLong(0)).values.map(_.minBy(_.getLong(1)))
    // event_id order == arrival order in the synthetic data, so the
    // min-event_id row per user has no preceding lags
    first.foreach { r =>
      assert(r.getLong(3) == r.getLong(2),
        s"first sample of user ${r.getLong(0)} must be unsmoothed")
    }
    // smoothing never leaves the envelope of the last 8 samples:
    // a weighted mean is bounded by min/max of its inputs
    val byUser = rows.groupBy(_.getLong(0)).values
    byUser.foreach { urs =>
      val sorted = urs.sortBy(_.getLong(1))
      sorted.indices.foreach { i =>
        val window = sorted.slice(math.max(0, i - 7), i + 1).map(_.getLong(2))
        val e = sorted(i).getLong(3)
        assert(e >= window.min - 1 && e <= window.max + 1,
          "EWMA escapes its sample envelope")
      }
    }
  }

  test("win_ewma plans ONE data exchange (all lag windows share user hash)") {
    val p = finalPlan(Relational7.winEwma(spark, sf))
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1, s"expected 1 hash exchange, got $n:\n$p")
  }

  test("graph_jaccard scores are exact-integer, bounded and sorted") {
    val rows = Relational7.graphJaccard(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (inter, bp) = (r.getLong(2), r.getLong(3))
      assert(inter >= 1, "candidates share at least one part")
      assert(bp >= 1 && bp <= 10000, s"jaccard bp out of range: $bp")
      assert(r.getLong(0) < r.getLong(1), "pairs oriented sa < sb")
    }
    val bps = rows.map(_.getLong(3)).toSeq
    assert(bps == bps.sortBy(-_), "descending by jacc_bp")
  }

  test("ts_downsample keeps exactly the argmax-deviation sample per hour") {
    import org.apache.spark.sql.functions._
    val got = Relational7.tsDownsample(spark, sf).collect()
    // recompute the expected survivor per bucket on the driver (sf0.001
    // events are 1k rows)
    val ev = engine.Tables.events(spark, sf)
      .select(col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("v_mu"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byBucket = ev.groupBy { case (_, ts, _) =>
      ts / 3600000000L * 3600000000L }
    assert(got.length == byBucket.size, "one row per non-empty hour")
    got.foreach { r =>
      val (bucket, eid, vmu, dev) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val rowsIn = byBucket(bucket)
      val n = rowsIn.length.toLong
      val s = rowsIn.map(_._3).sum
      val devs = rowsIn.map { case (id, _, v) => (id, v, (v * n - s).abs) }
      val maxd = devs.map(_._3).max
      val expectId = devs.filter(_._3 == maxd).map(_._1).min
      assert(dev == maxd && eid == expectId
        && vmu == devs.find(_._1 == expectId).get._2,
        s"bucket $bucket picked wrong survivor")
    }
  }

  test("agg_diversity: effective languages within [1, n_langs], exact bounds") {
    val rows = Relational7.aggDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nLangs, simpson, eff) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(simpson >= 0 && simpson < 1000000)
      assert(eff >= 10000 && eff <= nLangs * 10000,
        s"inverse Simpson must lie in [1, n_langs]: $eff vs $nLangs")
    }
  }

  test("agg_diversity's quadratic indices are exact past the BIGINT-product " +
    "range (a 100 TB corpus's per-source doc counts)") {
    // n_docs²·10⁶ overflows BIGINT past a mere ~3e6 docs per source and
    // c·c past ~3e9 per (source, lang) — the decimal spellings must keep
    // computing the true indices, checked against BigInt math on
    // language-count mixes synthesized at corpus scale
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(
      Seq(3000000L, 2999999L),          // just past the ×10⁶ edge
      Seq(4000000000L, 1000000000L),    // c·c past BIGINT
      Seq(900000000000L, 90000000000L, 10000000000L) // 1e12 docs
    ).foreach { counts =>
      val ss = counts.map(c => BigInt(c) * c).sum
      val n2 = BigInt(counts.sum) * counts.sum
      val expSimpson = ((n2 - ss) * 1000000 / n2).toLong
      val expEff = (n2 * 10000 / ss).toLong
      val got = counts.toDF("c")
        .agg(sum($"c").as("n_docs"),
          sum($"c".cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * $"c").as("ss"))
        .select(expr(Relational7.SimpsonE6Expr).as("simpson_e6"),
          expr(Relational7.EffLangsE4Expr).as("eff_langs_e4"))
        .head()
      assert(got.getLong(0) == expSimpson,
        s"counts=$counts: decimal simpson ${got.getLong(0)} != $expSimpson")
      assert(got.getLong(1) == expEff,
        s"counts=$counts: decimal eff-langs ${got.getLong(1)} != $expEff")
    }
  }

  test("dedup_substring fractions are bounded and duplication is mutual") {
    val rows = DedupOps.dedupSubstring(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "only docs with >= 1 window appear")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 10000)
    }
    // a duplicated window occurs >= 2 times globally, so the corpus
    // either has zero duplicated windows or at least two
    val totalDup = rows.map(r => r.getLong(2) * r.getLong(1) / 10000).sum
    assert(totalDup == 0 || totalDup >= 2)
  }

  test("win_slope recomputes exactly from the closed-form power sums") {
    val got = Relational7.winSlope(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // independent driver-side recompute over the raw events
    import org.apache.spark.sql.functions._
    val ev = engine.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("v_mu"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 7), i + 1).map(_._4)
        val m = frame.length.toLong
        val expected = if (m < 2) 0L else {
          val sy = frame.sum
          val sxy = frame.zipWithIndex.map { case (y, x) => x * y }.sum
          val sx = m * (m - 1) / 2
          val sxx = (m - 1) * m * (2 * m - 1) / 6
          (m * sxy - sx * sy) * 1000000L / (m * sxx - sx * sx)
        }
        assert(got((uid, ordered(i)._2))._2 == expected,
          s"slope mismatch for user $uid event ${ordered(i)._2}")
      }
    }
  }

  test("mix_epochs: largest language stays at 1 epoch, others upsample") {
    val rows = Relational7.mixEpochs(spark, sf).collect()
    assert(rows.nonEmpty)
    val maxT = rows.map(_.getLong(1)).max
    rows.foreach { r =>
      val (t, e, eff) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(e == math.min((maxT + t - 1) / t, Relational7.MaxEpochs))
      assert(eff == e * t)
      if (t == maxT) assert(e == 1L)
    }
    assert(rows.map(_.getLong(2)).max > 1L,
      "the corpus mix must actually exercise upsampling")
  }

  test("data_split_stratified: per-source fractions are EXACT") {
    val rows = Relational7.dataSplitStratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val n = docs.length.toLong
      val bySplit = docs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      assert(bySplit.getOrElse("train", 0L) == n * 8 / 10)
      assert(bySplit.getOrElse("valid", 0L) == n / 10)
      assert(bySplit.getOrElse("test", 0L) == n - n * 8 / 10 - n / 10)
    }
    // deterministic under re-execution
    val again = Relational7.dataSplitStratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("agg_tpch_q6 pushes all three predicates into the parquet scan") {
    val df = Relational7.aggTpchQ6(spark, sf)
    // executedPlan.toString truncates PushedFilters at 100 chars;
    // formatted explain prints the full pushed list
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_quantity,24.0)"),
      s"Q6 predicates must reach the scan:\n$p")
    // projection prunes to exactly the 4 referenced columns
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(read.split(",").length == 4, s"pruned read schema, got: $read")
    val r = df.collect().head
    assert(r.getLong(1) > 0, "the predicate window matches rows")
  }

  test("join_tpch_q3 takes the top-10 orders by exact decimal revenue") {
    val rows = Relational7.joinTpchQ3(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).toSeq
    assert(revs == revs.sortBy(-_), "descending revenue")
    val p = Relational7.joinTpchQ3(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      "bounded top-k must plan TakeOrdered, not a global sort")
  }

  test("join_tpch_q18 keeps only orders above the quantity threshold") {
    val rows = Relational7.joinTpchQ18(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getLong(4) > Relational7.Q18MinQty))
    val qtys = rows.map(_.getLong(4)).toSeq
    assert(qtys == qtys.sortBy(-_), "descending total quantity")
  }

  test("ts_changepoint finds the exact integer-CUSUM argmax per user") {
    import org.apache.spark.sql.functions._
    val got = Relational7.tsChangepoint(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = engine.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("v_mu"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.keySet == ev.map(_._1).toSet, "one changepoint per user")
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      val n = ordered.length.toLong
      val sy = ordered.map(_._4).sum
      var cum = 0L
      val devs = ordered.zipWithIndex.map { case (r, i) =>
        cum += r._4
        (r._2, i + 1L, (n * cum - (i + 1L) * sy).abs)
      }
      val maxd = devs.map(_._3).max
      val (eid, t, _) = devs.filter(_._3 == maxd).minBy(_._1)
      assert(got(uid) == ((eid, t * 10000 / n, maxd)),
        s"user $uid changepoint mismatch")
    }
  }

  test("win_drawdown: drawdown is nonnegative, zero exactly at new peaks") {
    import org.apache.spark.sql.functions.{col, expr}
    val rows = Relational7.winDrawdown(spark, sf).collect()
    assert(rows.nonEmpty)
    // the window orders by event TIME; recover it for the re-check
    val tsOf = engine.Tables.events(spark, sf)
      .select(col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).values.foreach { urs =>
      val ordered = urs.sortBy(r => (tsOf(r.getLong(1)), r.getLong(1)))
      var peak = Long.MinValue
      ordered.foreach { r =>
        val (v, p, dd) = (r.getLong(2), r.getLong(3), r.getLong(4))
        peak = math.max(peak, v)
        assert(p == peak, "running peak")
        assert(dd == peak - v && dd >= 0)
      }
    }
  }

  test("sim_matryoshka: recall is bounded and improves with prefix width") {
    val rows = graft.engine.ops.SimOps.simMatryoshka(spark, sf).collect()
    assert(rows.length == graft.engine.ops.SimOps.MatryoshkaDims.length * 10)
    rows.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= 5))
    val meanByDim = rows.groupBy(_.getLong(0)).view
      .mapValues(rs => rs.map(_.getLong(2)).sum.toDouble / rs.length).toMap
    // 32 of 64 dims must approximate the full ranking at least as well
    // as 8 of 64 on average — the curve the op exists to measure
    assert(meanByDim(32L) >= meanByDim(8L),
      s"recall curve inverted: $meanByDim")
    assert(meanByDim(32L) > 0, "wide prefixes must recover some of top-5")
  }

  test("text_gopher_rules: pass is exactly the conjunction of its flags") {
    val rows = TextOps.textGopherRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = (2 to 5).map(r.getBoolean)
      assert(r.getBoolean(6) == flags.forall(identity))
    }
    // the rule set must discriminate on this corpus (not all-true/false)
    val passes = rows.count(_.getBoolean(6))
    assert(passes > 0 && passes < rows.length,
      s"gopher rules must split the corpus, got $passes/${rows.length}")
  }
}
