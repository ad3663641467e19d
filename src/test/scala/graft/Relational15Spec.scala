package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.engine.ops.Relational15

/** The Relational15 batch: the TPC-H shapes over the lineitem-derived
  * supply relation (Q2 correlated min, Q9 profit rollup, Q11
  * group-vs-global HAVING, Q20 semi-join chain). */
class Relational15Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.01"

  /** Driver-side supply relation recompute (the oracle the batch's
    * invariants are checked against). */
  private lazy val supply: Map[(Long, Long), (BigDecimal, Long, Long)] =
    Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        min(col("l_extendedprice").cast("decimal(18,2)")).as("c"),
        sum(col("l_quantity")).cast("long").as("aq"),
        sum(when(year(col("l_shipdate")) === 1997, col("l_quantity"))
          .otherwise(0.0)).cast("long").as("q97"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((BigDecimal(r.getDecimal(2)), r.getLong(3), r.getLong(4))))
      .toMap

  test("join_tpch_q2: every returned supplier charges its part's minimum " +
    "cost among returned suppliers of that part") {
    val rows = Relational15.joinTpchQ2(spark, sf).collect()
    assert(rows.nonEmpty)
    // all returned (part, supplier) rows carry the min cost over the
    // part's rows — a non-min row surviving the equality join is a bug
    rows.groupBy(_.getLong(3)).foreach { case (_, rs) =>
      assert(rs.map(_.getDouble(5)).distinct.length == 1,
        "two different costs returned for one part — min-equality failed")
    }
    // the reported cost really is the supply relation's cost
    rows.foreach { r =>
      val key = (r.getLong(3), r.getLong(4))
      assert(supply(key)._1.toDouble == r.getDouble(5))
    }
  }

  test("join_tpch_q9: profit never exceeds revenue (cost is non-negative)") {
    val rows = Relational15.joinTpchQ9(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute one group's profit driver-side, exactly
    val first = rows.head
    val (nat, yr) = (first.getString(0), first.getLong(1))
    val natSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_name") === nat),
        col("s_nationkey") === col("n_nationkey"))
      .collect().map(_.getAs[Long]("s_suppkey")).toSet
    val parts = Tables.part(spark, sf)
      .filter(col("p_name").contains(Relational15.Q9NamePattern))
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    val orderYear = Tables.orders(spark, sf)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .collect()
      .filter(r => parts(r.getLong(1)) && natSupp(r.getLong(2))
        && orderYear(r.getLong(0)) == yr
        && supply.contains((r.getLong(1), r.getLong(2))))
      .map { r =>
        val cost = supply((r.getLong(1), r.getLong(2)))._1
        BigDecimal(r.getDecimal(4)) - cost * BigDecimal(r.getDouble(3))
      }.sum
    assert(math.abs(expect.toDouble - first.getDouble(2)) < 1e-6,
      s"recomputed profit $expect vs ${first.getDouble(2)}")
  }

  test("join_tpch_q11: every returned part value exceeds 2x the mean, and " +
    "no omitted part does") {
    val got = Relational15.joinTpchQ11(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    // recompute the per-part values driver-side in exact decimal
    val euro = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf)
        .filter(col("r_name") === Relational15.Q11Region),
        col("n_regionkey") === col("r_regionkey"))
      .collect().map(_.getAs[Long]("s_suppkey")).toSet
    val vals = supply.toSeq.collect {
      case ((pk, sk), (cost, aq, _)) if euro(sk) => pk -> (cost * BigDecimal(aq))
    }.groupBy(_._1).map { case (pk, vs) => pk -> vs.map(_._2).sum }
    val tot = vals.values.sum
    val n = vals.size
    vals.foreach { case (pk, v) =>
      val qualifies = v * 100 * n > tot * 100 * 2
      assert(qualifies == got.contains(pk),
        s"part $pk value $v (n=$n total=$tot): qualifies=$qualifies " +
          s"returned=${got.contains(pk)}")
    }
  }

  test("join_tpch_q20: every returned supplier is in the nation AND holds a " +
    "fast-moving small part") {
    val rows = Relational15.joinTpchQ20(spark, sf).collect()
    assert(rows.nonEmpty)
    val natKeys = Tables.nation(spark, sf)
      .filter(col("n_name") === Relational15.Q20Nation)
      .collect().map(_.getAs[Number]("n_nationkey").longValue).toSet
    val suppNation = Tables.supplier(spark, sf)
      .collect().map(r => r.getAs[Number]("s_suppkey").longValue ->
        r.getAs[Number]("s_nationkey").longValue).toMap
    val smallParts = Tables.part(spark, sf)
      .filter(col("p_name").startsWith(Relational15.Q20NamePrefix))
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    val fastSupp = supply.toSeq.collect {
      case ((pk, sk), (_, aq, q97)) if smallParts(pk) && q97 * 2 > aq => sk
    }.toSet
    val expect = suppNation.collect {
      case (sk, nk) if natKeys(nk) && fastSupp(sk) => sk
    }.toSet
    assert(rows.map(_.getLong(0)).toSet == expect)
  }
}
