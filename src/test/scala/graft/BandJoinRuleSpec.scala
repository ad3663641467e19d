package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.engine.ops.Relational3

/** BandJoinRule: a raw `abs(x − y) <= c` inner join must be rewritten
  * to a bucketed equi-join (no nested loop), produce exactly the naive
  * join's rows, and leave non-band joins untouched. */
class BandJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("raw band join plans a hash equi-join, not a nested loop") {
    val p = Relational3.joinBandAuto(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band join not rewritten:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("rewritten band join returns exactly the naive nested-loop result") {
    // tiny frames so the unrewritten reference can brute-force in Scala
    val xs = (0 until 300).map(i => (i.toLong, i * 0.37))
    val ys = (0 until 200).map(j => (j.toLong, j * 0.53 + 0.1))
    val expected = (for {
      (i, x) <- xs; (j, y) <- ys if math.abs(x - y) <= 0.25
    } yield (i, j)).toSet
    val got = xs.toDF("i", "x")
      .join(ys.toDF("j", "y"), abs($"x" - $"y") <= 0.25)
      .select($"i", $"j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "band must actually match something")
  }

  test("joins with an existing equi-key are left untouched") {
    val base = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val other = Seq((1L, 2.2), (2L, 9.9)).toDF("k2", "v2")
    val joined = base.join(other, $"k" === $"k2" && abs($"v" - $"v2") <= 0.5)
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_band"), "rule must not fire on equi-joins")
    assert(joined.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
