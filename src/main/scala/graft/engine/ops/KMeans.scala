package graft.engine.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's) over an embedding
  * column — trains the coarse centroids an IVF index wants
  * (SimOps.simIvf / DedupOps.dedupEmbed use "first k vectors" for
  * their cross-engine oracles; production centroids come from here).
  *
  * Every step is a plan-level DataFrame op and every arithmetic choice
  * is the engine's cross-engine-exact repertoire, so training is
  * bit-reproducible run-to-run and cluster-layout-independent:
  *
  *  - init: the first k vectors by id (no RNG)
  *  - assignment: argmax cosine against literal unit centroids via the
  *    sortable-BIGINT encoding (round(dot·1e6)·k + tie-break id) —
  *    one map-only projection per iteration
  *  - update: element-wise mean via scaled-BIGINT sums
  *    (round(x·1e9) is exact for float-width mantissas; integer sums
  *    are fold-order-free), then one double division
  *  - objective: Σ max-dot as a scaled-BIGINT sum — exact, so
  *    "non-decreasing" is a hard spec assertion, not a tolerance
  *
  * Each iteration is ONE Spark job: the k-dot assignment projection
  * streams into a single (cid, pos) cell aggregate that carries both
  * the mean sums and the exact objective (folded onto the pos=0
  * cells), so the dominant projection runs exactly once with no
  * materialization barrier. At 100 TB that is the standard k-means
  * shape: broadcast centroids, map-side partial aggregation, driver
  * holds only k·dim doubles.
  */
object KMeans {

  final case class Model(centroids: Array[Array[Double]], objective: Double)

  private[ops] def unit(c: Array[Double]): Array[Double] = {
    val n = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
    if (n == 0.0) c else c.map(_ / n)
  }

  private def arrLit(a: Array[Double]): String =
    "array(" + a.map(x => s"${x}D").mkString(",") + ")"

  /** Train on `df` with columns (id: long, v: array<double>). */
  def fit(df: DataFrame, k: Int, iters: Int): Model = {
    val vecs = df.select($"id", $"v").transform(Checkpoints.cut)
    var centroids: Array[Array[Double]] = vecs.orderBy($"id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    var objective = Double.MinValue
    var it = 0
    while (it < iters) {
      val cus = centroids.map(unit)
      // enc_j = (round(dot_j * 1e6) + 4e9) * k + (k-1-j): argmax dot with
      // smallest-centroid tie-break, as one sortable BIGINT
      val encs = cus.zipWithIndex.map { case (c, j) =>
        s"(cast(round(graft_dot(v, ${arrLit(c)}) * 1000000D) as bigint)" +
          s" + 4000000000L) * $k + ${k - 1 - j}"
      }
      // ONE job per iteration: the k-dot assignment projection feeds a
      // single (cid, pos) cell aggregate that carries BOTH the exact
      // scaled-BIGINT mean sums AND the exact objective (folded onto
      // the pos=0 cells so each row contributes it once) — no
      // materialization barrier, no second action
      val cells = vecs
        .withColumn("enc", expr(s"array_max(array(${encs.mkString(",")}))"))
        .withColumn("cid", lit(k - 1) - ($"enc" % k).cast("int"))
        .withColumn("objpart",
          (($"enc" - ($"enc" % k)) / k - 4000000000L).cast("long"))
        .select($"cid", $"objpart", posexplode(expr(
          "transform(v, x -> cast(round(x * 1000000000D) as bigint))")))
        .groupBy($"cid", $"pos")
        .agg(sum($"col").as("s"), count(lit(1)).as("n"),
          sum(when($"pos" === 0, $"objpart")).as("op"))
        .collect()
      val next = centroids.map(_.clone())
      cells.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          r.getLong(2).toDouble / (r.getLong(3).toDouble * 1e9)
      }
      // exact objective: Σ max-dot (scaled), monotone under Lloyd's
      val obj = cells.filter(_.getInt(1) == 0).map(_.getLong(4)).sum / 1e6
      centroids = next
      objective = obj
      it += 1
    }
    Model(centroids, objective)
  }
}
