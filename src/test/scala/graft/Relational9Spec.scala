package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.engine.ops.Relational9

/** The Relational9 batch: storage-layout + sketch primitives. Each test
  * recomputes the expected answer from first principles on sf0.001 (which
  * deliberately contains prefix-colliding sources `src1`/`src10` — the
  * exact data shape that broke `data_enumerate`'s round-5 concat key) and
  * asserts the promised plan shapes: no SinglePartition exchange in the
  * enumeration, a single presentation-sort exchange in `embed_rp`, no
  * rank window anywhere in `ts_winsorize`. */
class Relational9Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("data_enumerate matches row_number over (source, doc_id) on prefix-colliding sources") {
    val sources = Tables.documents(spark, sf).select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(sources.contains("src1") && sources.contains("src10"),
      "testdata must contain prefix-colliding sources for this test to bite")

    val got = Relational9.dataEnumerate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
      .withColumn("global_idx",
        row_number().over(Window.orderBy(col("source"), col("doc_id"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq)

    val plan = Relational9.dataEnumerate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"enumeration must not funnel the data through one partition:\n$plan")
  }

  test("data_compact_plan bins match a local running-sum recomputation") {
    val got = Relational9.dataCompactPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs
      .groupBy(d => (d._1, d._2 / Relational9.CompactStripe))
      .map { case ((src, fid), rows) =>
        (src, fid, rows.length.toLong, rows.map(_._3).sum)
      }
      .toSeq.sortBy(t => (t._1, t._2))
      .groupBy(_._1).toSeq
      .flatMap { case (_, files) =>
        files.scanLeft(("", 0L, 0L, 0L, 0L)) { case ((_, _, _, cum, fb), f) =>
          (f._1, f._2, f._3, cum + fb, f._4)
        }.drop(1).map { case (src, fid, n, cum, fb) =>
          (src, fid, n, fb, cum / Relational9.CompactTarget,
            cum % Relational9.CompactTarget)
        }
      }
    assert(got.sortBy(t => (t._1, t._2)).toSeq ==
      expected.sortBy(t => (t._1, t._2)))
  }

  test("ts_winsorize thresholds are exact order statistics; clip clamps; no rank window") {
    val q = Relational9.tsWinsorize(spark, sf)
    val rows = q.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byType = rows.groupBy(_._2)
    byType.foreach { case (_, rs) =>
      val sorted = rs.map(_._3).sorted
      val n = sorted.length.toLong
      val lo = sorted(((n * Relational9.WinsorPct + 99) / 100 - 1).toInt)
      val hi = sorted(((n * (100 - Relational9.WinsorPct) + 99) / 100 - 1).toInt)
      rs.foreach { case (_, _, v, pLo, pHi, clip) =>
        assert(pLo == lo && pHi == hi,
          s"thresholds ($pLo,$pHi) != order statistics ($lo,$hi)")
        assert(clip == math.min(math.max(v, lo), hi))
      }
    }
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number") && !plan.contains("percent_rank"),
      s"winsorize must select from the histogram, not rank raw events:\n$plan")
  }

  test("embed_rp reproduces a hand-computed projection; only the presentation sort shuffles") {
    val q = Relational9.embedRp(spark, sf)
    // sign matrix from the engine's own hash, fetched once
    val signs = spark.sql(
      s"""SELECT k, j,
         |  IF(graft_polyhash(concat('rp:', k, ':', j)) % 2 = 0, 1L, -1L) AS s
         |FROM (SELECT explode(sequence(0, ${Relational9.RpDims - 1})) AS k)
         |CROSS JOIN (SELECT explode(sequence(0, 63)) AS j)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val first = Tables.embeddings(spark, sf).orderBy(col("vec_id")).limit(1)
      .collect().head
    val vid = first.getLong(0)
    val vMu = first.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong)
    val got = q.filter(col("vec_id") === vid).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    (0 until Relational9.RpDims).foreach { k =>
      val expected = (0 until 64).map(j => signs((k, j)) * vMu(j)).sum
      assert(got(k.toLong) == expected, s"dim $k: ${got(k.toLong)} != $expected")
    }
    val plan = q.queryExecution.executedPlan.toString
    val nExchanges = "Exchange".r.findAllIn(plan).length
    assert(nExchanges <= 1,
      s"projection is map-only; only the output sort may exchange:\n$plan")
  }

  test("agg_hll registers estimate within HLL error; exact column is exact") {
    val r = Relational9.aggHll(spark, sf).collect().head
    val (m, vZero, sInv, est, exact, errBp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
    assert(m == Relational9.HllM.toLong)
    assert(vZero >= 0 && vZero <= m)
    assert(sInv >= m, "each register contributes at least 2^(31-31)=1... and r=0 gives 2^31")
    val trueDistinct = Tables.lineitem(spark, sf)
      .select(countDistinct(col("l_orderkey"))).collect().head.getLong(0)
    assert(exact == trueDistinct)
    // m=256 -> sigma ~ 1.04/sqrt(256) = 6.5%; 25% is a 3.8-sigma bound
    assert(errBp < 2500, s"estimate $est vs exact $exact drifts err_bp=$errBp")
  }
}
