package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.ops.SplitSum

/** SplitSum.splitSum must equal sum(v.cast(decimal(38,0))) exactly for
  * ALL BIGINT values — the two's-complement identity holds across the
  * full signed domain (the tests below pin both extremes, and
  * aggRollup feeds signed c_acctbal through it): the optimization
  * swaps the accumulator representation, never the value. */
class SplitSumSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val d38 = DecimalType(38, 0)

  private def check(vals: Seq[Long], groups: Seq[Int]): Unit = {
    import spark.implicits._
    val df = vals.zip(groups).toDF("v", "g")
    val got = df.groupBy($"g")
      .agg(SplitSum.splitSum($"v").as("s"))
      .orderBy($"g").collect()
    val want = df.groupBy($"g")
      .agg(sum($"v".cast(d38)).as("s"))
      .orderBy($"g").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (a, b) =>
      assert(a.getDecimal(1) == b.getDecimal(1) && a.getInt(0) == b.getInt(0),
        s"split sum diverged for group ${a.getInt(0)}: " +
          s"${a.getDecimal(1)} != ${b.getDecimal(1)}")
    }
  }

  test("fuzz: split sum == decimal sum on random longs, both signs") {
    val rnd = new scala.util.Random(42)
    // mixed magnitudes: cents (≤1e7), cents² (≤1.2e14), near-2^63 —
    // each drawn with random sign (signed acctbal-style domains)
    val vals = Seq.fill(2000) {
      val m = rnd.nextInt(3) match {
        case 0 => rnd.nextLong(12000000L)
        case 1 => rnd.nextLong(120000000000000L)
        case _ => Long.MaxValue - rnd.nextLong(1000L)
      }
      if (rnd.nextBoolean()) m else -m
    }
    val groups = Seq.fill(2000)(rnd.nextInt(4))
    check(vals, groups)
  }

  test("boundary values incl. negatives and both long extremes") {
    val b = Seq(0L, 1L, -1L, (1L << 21) - 1, 1L << 21, -(1L << 21),
      (1L << 42) - 1, 1L << 42, -(1L << 42),
      Long.MaxValue, Long.MinValue, Long.MinValue + 1)
    check(b ++ b, (0 until 24).map(_ % 4))
  }

  test("null rows are skipped identically; all-null group is NULL") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, Int)]((5L, 0), (null, 0), (null, 1))
      .toDF("v", "g")
    val got = df.groupBy($"g").agg(SplitSum.splitSum($"v").as("s"))
      .orderBy($"g").collect()
    val want = df.groupBy($"g").agg(sum($"v".cast(d38)).as("s"))
      .orderBy($"g").collect()
    assert(got(0).getDecimal(1) == want(0).getDecimal(1))
    assert(got(1).isNullAt(1) && want(1).isNullAt(1))
  }
}
