package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.functions.{TopKAggregator, VectorOps}

/** Bounded top-k aggregator: agrees with global sort-and-limit, keeps
  * O(k) state, and slots into typed groupBy aggregation. */
class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("agrees with brute-force sim_topk over the embeddings table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    VectorOps.register(spark)
    val d = "/root/testdata/sf0.001"
    val ve = graft.engine.Tables.embeddings(spark, d)
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    val scored = ve.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(ve.filter($"vec_id" === 0)
        .select($"v".as("qv"), $"nrm".as("qn"))))
      .select($"vec_id",
        (expr("graft_dot(v, qv)") / ($"nrm" * $"qn")).as("cos"))
    val expected = scored.orderBy($"cos".desc, $"vec_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = scored.as[(Long, Double)]
      .select(new TopKAggregator(10).toColumn)
      .first()
    assert(got == expected)
  }

  test("random data, ties, duplicate scores and ANY partitioning give " +
    "exactly sort-and-take-k") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the partial-merge path (partition heaps folded pairwise in
    // arbitrary order) must be invariant to layout; heavy score ties
    // exercise the (score desc, id asc) keep-order tiebreak
    val gen = for {
      n <- Gen.chooseNum(0, 120)
      k <- Gen.oneOf(1, 3, 10)
      parts <- Gen.oneOf(1, 3, 7)
      scores <- Gen.listOfN(n, Gen.oneOf(0.0, 0.25, 0.5, 0.5, 1.0, -1.0, 2.5))
    } yield (k, parts, scores.zipWithIndex.map { case (s, i) => (i.toLong, s) })
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(gen) { case (k, parts, rows) =>
        val expected = rows
          .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
          .take(k)
        val got = spark.createDataset(rows).repartition(parts)
          .select(new TopKAggregator(k).toColumn).first()
        got == expected
      })
    assert(res.passed, res.status.toString)
  }

  test("per-group top-k inside a typed aggregation") {
    import spark.implicits._
    val data = Seq(
      ("g1", 1L, 0.5), ("g1", 2L, 0.9), ("g1", 3L, 0.9), ("g1", 4L, 0.1),
      ("g2", 5L, 0.3), ("g2", 6L, 0.2))
    val got = data.toDS()
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAggregator(2).toColumn)
      .collect().toMap
    assert(got("g1") == Seq((2L, 0.9), (3L, 0.9)), "score desc, id-asc tie-break")
    assert(got("g2") == Seq((5L, 0.3), (6L, 0.2)))
  }
}
