package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.{PipelineOps, TextOps}

/** Composed-pipeline operators: verdict partition invariants, the typed
  * top-k Aggregator against its window-query twin, and the trained-IVF
  * retrieval path. (Cross-engine hashes are the Verify gate's job; these
  * are the structural invariants the gate can't see.) */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("pipeline_clean: every doc gets exactly one verdict; reasons honor rule order") {
    val out = PipelineOps.pipelineClean(spark, sf).localCheckpoint()
    val nDocs = graft.engine.Tables.documents(spark, sf).count()
    assert(out.count() == nDocs, "one verdict row per document")
    // kept <=> no reason; rejected <=> exactly one reason string
    assert(out.filter($("kept") && $("reason").isNotNull).count() == 0)
    assert(out.filter(!$("kept") && $("reason").isNull).count() == 0)
    // a kept doc passes EVERY rule, not just the short-circuit order
    val kept = out.filter($("kept"))
    assert(kept.filter($("quality") < PipelineOps.MinQuality).count() == 0)
    assert(kept.filter($("rep_bp") > PipelineOps.MaxRepBp).count() == 0)
    // duplicates outrank every other reason: any doc sharing a normalized
    // body with a smaller doc_id must be rejected as 'duplicate'
    val dupIds = TextOps.dedupExact(spark, sf)
      .filter($("n_copies") > 1).select($("doc_id")).collect().map(_.getLong(0)).toSet
    out.filter($("reason") === "duplicate").collect().foreach { r =>
      assert(!dupIds.contains(r.getLong(0)), "survivor must not be rejected as duplicate")
    }
  }

  test("pipeline_pack packs exactly the kept documents, contiguously") {
    val kept = PipelineOps.pipelineClean(spark, sf)
      .filter($("kept")).select($("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val packed = PipelineOps.pipelinePack(spark, sf).collect()
    assert(packed.map(_.getLong(0)).toSet == kept,
      "packed set must equal the clean-verdict survivors")
    // contiguity over the SURVIVOR ordering (same invariant as
    // pack_sequences, on the filtered corpus)
    val b = PipelineOps.PackBudget
    val starts = packed.map(r => r.getLong(2) * b + r.getLong(3))
    val ends = packed.map(_.getLong(1)).scanLeft(0L)(_ + _)
    assert(starts.sameElements(ends.init))
  }

  test("agg_topk_custom matches the sort-based window twin") {
    import org.apache.spark.sql.expressions.Window
    val agg = PipelineOps.aggTopkCustom(spark, sf)
    val twin = graft.engine.Tables.customer(spark, sf)
      .withColumn("rk", row_number().over(Window.partitionBy($("c_mktsegment"))
        .orderBy($("c_acctbal").desc, $("c_custkey"))))
      .filter($("rk") <= 3)
      .select($("c_mktsegment"), $("rk"), $("c_custkey"),
        $("c_acctbal").cast("double").as("bal"))
      .orderBy($("c_mktsegment"), $("rk"))
    assert(agg.collect().toSeq == twin.collect().toSeq)
  }

  test("sim_ivf_kmeans returns 5 ranked neighbors, none the query itself") {
    val rows = PipelineOps.simIvfKmeans(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(0) != 0L), "query vector excluded")
    val cosines = rows.map(_.getLong(1)) // floor-scaled cos·1e4 digest
    assert(cosines.sameElements(cosines.sorted.reverse), "descending cosine order")
  }

  private def $(c: String) = col(c)
}
