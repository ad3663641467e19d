package graft.engine.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star similarity-search operators).
  *
  * [[simTopk]] is the exact brute-force baseline: broadcast the query
  * vector, one map-only cosine pass over the corpus, TakeOrdered top-k
  * — at 100 TB this is one scan, no shuffle beyond the final top-k
  * merge, and the pattern to beat.
  *
  * [[simLsh]] is the scale path: random-hyperplane LSH. Each vector is
  * sign-hashed against 4 fixed integer hyperplanes into a 4-bit bucket
  * (map-only); the query probes only its own bucket (~1/16 of the
  * corpus), then ranks candidates by exact cosine. Hyperplanes are a
  * deterministic integer lattice (((k·131 + i·31) mod 17) − 8) so both
  * engines compute identical buckets — at production scale these would
  * be seeded Gaussian vectors, with multi-probe on neighboring buckets
  * for recall.
  */
object SimOps {
  type Q = (SparkSession, String) => DataFrame

  /** (vec_id, v: array<double>, nrm) with fold-order-stable norm.
    * Uses the native codegen'd `graft_dot` (see VectorExprs) — same
    * IEEE fold order as the declarative aggregate/zip_with form the
    * DuckDB oracle mirrors. */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    graft.engine.functions.VectorOps.register(s)
    Tables.embeddings(s, d)
      .repartition($"vec_id") // single-file scan → spread across cores
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      .select($"vec_id", $"v", $"nrm")
  }

  private val dotSql = "graft_dot(v, qv)"

  /** Embedding dimensionality of the driver testdata. */
  private val Dim = 64

  /** The k-th deterministic integer-lattice hyperplane as a SQL double
    * array literal (constant-folded by Catalyst). */
  private def hyperplane(k: Int): String =
    "array(" + (1 to Dim).map(i => s"${((k * 131 + i * 31) % 17 - 8).toDouble}D")
      .mkString(",") + ")"

  /** 4-bit hyperplane bucket of vector column `v`. */
  private val bucketSql: String =
    (0 until 4).map(k =>
      s"(CASE WHEN graft_dot(v, ${hyperplane(k)}) >= 0.0D THEN ${1 << k} ELSE 0 END)")
      .mkString(" + ")

  /** Exact top-10 cosine neighbors of vec_id 0 (brute force). */
  val simTopk: Q = (s, d) => {
    val ve = vecs(s, d)
    val q = ve.filter($"vec_id" === 0).select($"v".as("qv"), $"nrm".as("qn"))
    ve.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(expr(dotSql) / ($"nrm" * $"qn"), 4))
      .select($"vec_id", $"cos")
      .orderBy($"cos".desc, $"vec_id")
      .limit(10)
  }

  /** LSH-bucketed top-5: probe the query's 4-bit hyperplane bucket,
    * rank the bucket's candidates by exact cosine. */
  val simLsh: Q = (s, d) => {
    val ve = vecs(s, d).withColumn("bucket", expr(bucketSql))
    val q = ve.filter($"vec_id" === 0)
      .select($"v".as("qv"), $"nrm".as("qn"), $"bucket".as("qbucket"))
    ve.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .filter($"bucket" === $"qbucket")
      .withColumn("cos", round(expr(dotSql) / ($"nrm" * $"qn"), 4))
      .select($"vec_id", $"cos")
      .orderBy($"cos".desc, $"vec_id")
      .limit(5)
  }

  val queries: Map[String, Q] = Map(
    "sim_topk" -> simTopk,
    "sim_lsh" -> simLsh,
  )

  private val duckDot =
    "list_reduce(list_prepend(0.0, list_transform(range(1, len(e.v) + 1), " +
      "i -> e.v[i] * q.v[i])), (a, b) -> a + b)"

  private val duckVecs =
    """vecs AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
      |      (a, b) -> a + b)) AS nrm
      |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |        FROM embeddings))""".stripMargin

  private val duckBucket =
    """CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(0, 4), k -> CASE WHEN
      |      list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1),
      |        i -> v[i] * CAST((k * 131 + i * 31) % 17 - 8 AS DOUBLE))),
      |        (a, b) -> a + b) >= 0
      |      THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END)),
      |    (a, b) -> a + b) AS INTEGER)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_topk" ->
      s"""WITH $duckVecs
         |SELECT e.vec_id, round($duckDot / (e.nrm * q.nrm), 4) AS cos
         |FROM vecs e, (SELECT v, nrm FROM vecs WHERE vec_id = 0) q
         |WHERE e.vec_id <> 0
         |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin,

    "sim_lsh" ->
      s"""WITH $duckVecs,
         | b AS (
         |  SELECT vec_id, v, nrm, $duckBucket AS bucket FROM vecs)
         |SELECT e.vec_id, round($duckDot / (e.nrm * q.nrm), 4) AS cos
         |FROM b e, (SELECT v, nrm, bucket FROM b WHERE vec_id = 0) q
         |WHERE e.vec_id <> 0 AND e.bucket = q.bucket
         |ORDER BY cos DESC, e.vec_id LIMIT 5""".stripMargin,
  )
}
