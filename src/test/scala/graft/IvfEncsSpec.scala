package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native IVF-assignment kernel (`graft_ivf_encs`) against the
  * columnar spelling it replaced: C per-centroid
  * `round(graft_dot(v, cent_k)·1e6).cast(long)…` literal columns under
  * `array_sort`. The two must be BIT-identical — the kernel's whole
  * reason to exist is that the columnar form stops scaling (analyzer
  * cost per column; generated consume() past the 64 KB JIT limit →
  * interpreted fallback) around C ~ thousands, far below the
  * encoding's 10⁵ centroid cap, so the parity proof runs at C ≥ 1000
  * where the kernel is the only viable form. */
class IvfEncsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  graft.engine.functions.VectorOps.register(spark)

  /** Deterministic pseudo-random doubles in [−1, 1) — LCG on (seed, i). */
  private def prand(seed: Long, i: Int): Double = {
    val x = (seed * 6364136223846793005L + i * 1442695040888963407L)
    (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private def unit(v: Array[Double]): Seq[Double] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    v.map(_ / n).toSeq
  }

  test("graft_ivf_encs is bit-identical to the columnar spelling at " +
    "C = 1000 (incl. tie ranks and negative dots)") {
    val dim = 8
    val C = 1000
    // every 4th centroid repeats an earlier one EXACTLY → guaranteed
    // equal rounded dots, so the (C-1-k) tie-break is exercised
    val cents: Array[Seq[Double]] = Array.tabulate(C) { k =>
      val src = if (k % 4 == 3) k / 2 else k
      unit(Array.tabulate(dim)(j => prand(src + 1, j)))
    }
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.tabulate(dim)(j => prand(-7 * i - 1, j))))
      .toDF("vec_id", "v")
      .repartition(4)

    val kernel = vecs.withColumn("encs",
      call_function("graft_ivf_encs", $"v",
        typedLit(cents.toSeq.flatten)))
    val encCols = cents.zipWithIndex.map { case (c, k) =>
      (round(call_function("graft_dot", $"v", typedLit(c)) * 1000000d, 0)
        .cast("long") + 4000000000L) * 100000L + lit((C - 1 - k).toLong)
    }
    val columnar = vecs.withColumn("encs", array_sort(array(encCols: _*)))

    val a = kernel.orderBy($"vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2))
    val b = columnar.orderBy($"vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2))
    assert(a.length == 200)
    a.zip(b).foreach { case ((id1, e1), (id2, e2)) =>
      assert(id1 == id2)
      assert(e1 == e2, s"enc mismatch for vec_id=$id1")
    }
  }

  test("the kernel projection stays inside whole-stage codegen at C = 1000") {
    val dim = 8
    val cents = Seq.tabulate(1000 * dim)(i => prand(11, i))
    val df = (0 until 50).map(i =>
      (i.toLong, Seq.tabulate(dim)(j => prand(-i - 1, j))))
      .toDF("vec_id", "v")
      .repartition(2)
      .withColumn("encs", call_function("graft_ivf_encs", $"v", typedLit(cents)))
      .select($"vec_id", element_at($"encs", -1).as("top"))
    df.collect() // forces codegen compilation — a fallback would WARN and interpret
    // AQE hides the final stages from executedPlan.collect, so check the
    // rendered plan: a codegen'd operator line is starred ("*(1) Project"),
    // an interpreted fallback is not
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("ivfencs") && l.trim.matches("""[+-:\s]*\*\(\d+\) Project.*""")),
      s"graft_ivf_encs must sit in a starred (codegen'd) Project; plan:\n$plan")
  }

  test("a non-finite dot product (zero-norm centroid → NaN) fails loudly " +
    "with a named error, never a silently wrong centroid id") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "v")
      .withColumn("encs",
        call_function("graft_ivf_encs", $"v",
          typedLit(Seq(Double.NaN, Double.NaN))))
    val e = intercept[Exception] { df.collect() }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage)
        .exists(_.contains("non-finite dot product"))))
  }

  test("a matrix whose length is not a multiple of dim fails loudly") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "v")
      .withColumn("encs",
        call_function("graft_ivf_encs", $"v", typedLit(Seq(1.0, 2.0, 3.0, 4.0))))
    val e = intercept[Exception] { df.collect() }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("graft_ivf_encs"))))
  }
}
