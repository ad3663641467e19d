package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.multimodal.Multimodal

/** Multimodal plumbing: schema, partition-batched stub decode,
  * frame sampling arithmetic, determinism across runs. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("media table carries binary content with typed columns") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.select("kind").distinct.collect().map(_.getString(0)).toSet
      == Set("image", "audio", "video"))
  }

  test("stub decode is deterministic and consumes the binary column") {
    val d1 = Multimodal.decodeImages(Multimodal.mediaTable(spark, sf))
    val d2 = Multimodal.decodeImages(Multimodal.mediaTable(spark, sf))
    assert(!d1.columns.contains("content"), "bytes dropped before downstream")
    val r1 = d1.collect().sortBy(_.media_id).toSeq
    assert(r1 == d2.collect().sortBy(_.media_id).toSeq)
    assert(r1.forall(m => m.n_pixels == m.width.toLong * m.height))
    assert(r1.forall(m => m.width >= 64 && m.width < 192))
  }

  test("frame sampling: ceil(n/stride) frames kept, bytes accounted") {
    val f = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf),
      frameBytes = 64, stride = 4).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      assert(r.sampled_frames == (r.n_frames + 3) / 4)
      assert(r.sampled_bytes <= r.n_frames.toLong * 64)
    }
  }

  test("resize plan preserves aspect and bounds the long side") {
    val out = Multimodal.resizePlan(
      Multimodal.decodeImages(Multimodal.mediaTable(spark, sf)), maxSide = 100)
    out.collect().foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(math.max(ow, oh) <= 100)
      if (math.max(w, h) <= 100) assert((ow, oh) == ((w, h)))
    }
  }
}
