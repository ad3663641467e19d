package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.engine.ops.KMeans

/** Deterministic spherical k-means: bit-reproducible across runs,
  * exactly non-decreasing objective (integer arithmetic makes this a
  * hard assertion, not a tolerance), k centroids of the right shape. */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def vecs() = {
    graft.engine.ops.TextFeatures.ensureRegistered(spark)
    graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
  }

  test("training is bit-reproducible and objective is exactly monotone") {
    val objectives = (1 to 4).map(i => KMeans.fit(vecs(), k = 8, iters = i).objective)
    // objective(C_t) recorded at assignment time: running longer only
    // appends better-or-equal values — Lloyd monotonicity, exact
    assert(objectives == objectives.sorted,
      s"objective regressed across iterations: $objectives")
    val (m1, m2) = (KMeans.fit(vecs(), 8, 3), KMeans.fit(vecs(), 8, 3))
    assert(m1.centroids.length == 8 && m1.centroids.forall(_.length == 64))
    assert(m1.objective == m2.objective)
    assert(m1.centroids.flatten.toSeq == m2.centroids.flatten.toSeq,
      "bit-identical centroids across runs")
    // training moved the centroids off their init
    val init = vecs().orderBy($"id").limit(8).collect().map(_.getSeq[Double](1).toArray)
    assert(m1.centroids.flatten.toSeq != init.flatten.toSeq)
  }
}
