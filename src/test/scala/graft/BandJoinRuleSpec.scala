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

  test("rewritten band join equals brute force on RANDOM values and widths " +
    "(negative values, boundary hits)") {
    // the bucket arithmetic (floor division of signed values, width-2c
    // boundary absorption) is where a fixed grid can miss: fuzz values
    // across zero and widths across magnitudes
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      c <- Gen.oneOf(0.1, 0.25, 1.0, 7.5)
      nx <- Gen.chooseNum(1, 60)
      ny <- Gen.chooseNum(1, 60)
      xs <- Gen.listOfN(nx, Gen.chooseNum(-40.0, 40.0))
      ys <- Gen.listOfN(ny, Gen.chooseNum(-40.0, 40.0))
      // mix in exact-boundary pairs: y = x ± c must match (<=)
      bx <- Gen.chooseNum(-10.0, 10.0)
    } yield (c, xs :+ bx, ys ++ Seq(bx + c, bx - c))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(gen) { case (c, xs, ys) =>
        val expected = (for {
          (x, i) <- xs.zipWithIndex; (y, j) <- ys.zipWithIndex
          if math.abs(x - y) <= c
        } yield (i.toLong, j.toLong)).toSet
        val got = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("i", "x")
          .join(ys.zipWithIndex.map { case (y, j) => (j.toLong, y) }.toDF("j", "y"),
            abs($"x" - $"y") <= c)
          .select($"i", $"j").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        got == expected
      })
    assert(res.passed, res.status.toString)
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
