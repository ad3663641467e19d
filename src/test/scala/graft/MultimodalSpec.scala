package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.multimodal.Multimodal
import graft.engine.multimodal.Multimodal.Codec

/** Multimodal plumbing: schema, REAL partition-batched PNG
  * encode/decode (javax.imageio), frame sampling with per-frame
  * decode, determinism across runs. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def lumSum(w: Int, h: Int, seed: Long): Long =
    (for (x <- 0 until w; y <- 0 until h) yield (x + y + seed) % 256).sum

  test("media table carries binary content with typed columns") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.select("kind").distinct.collect().map(_.getString(0)).toSet
      == Set("image", "audio", "video"))
  }

  test("codec round-trips REAL PNG bytes: dimensions and every pixel") {
    for ((w, h, seed) <- Seq((16, 16, 0L), (135, 111, 119L), (1, 1, 7L))) {
      val png = Codec.encodePng(w, h, seed)
      // a real PNG container, not a fake header
      assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
      assert(Codec.decodeImage(png) == ((w, h, lumSum(w, h, seed))))
    }
    // trailing zero padding (the video frame-block layout) is ignored
    val padded = Codec.encodePng(4, 4, 3L) ++ Array.fill[Byte](100)(0)
    assert(Codec.decodeImage(padded) == ((4, 4, lumSum(4, 4, 3L))))
  }

  test("decode is deterministic, real, and consumes the binary column") {
    val d1 = Multimodal.decodeImages(Multimodal.imageTable(spark, sf))
    val d2 = Multimodal.decodeImages(Multimodal.imageTable(spark, sf))
    assert(!d1.columns.contains("content"), "bytes dropped before downstream")
    val r1 = d1.collect().sortBy(_.media_id).toSeq
    assert(r1.nonEmpty)
    assert(r1 == d2.collect().sortBy(_.media_id).toSeq)
    r1.foreach { m =>
      assert(m.width == 16 + (m.media_id % 120).toInt)
      assert(m.height == 16 + (m.media_id % 96).toInt)
      assert(m.n_pixels == m.width.toLong * m.height)
      assert(m.lum_sum == lumSum(m.width, m.height, m.media_id),
        s"decoded pixel sum mismatch for media ${m.media_id}")
    }
  }

  test("frame sampling really decodes every stride-th frame block") {
    val f = Multimodal.sampleFrames(Multimodal.videoTable(spark, sf)).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      assert(r.n_frames == 2 + (r.media_id % 7).toInt)
      assert(r.sampled_frames == (r.n_frames + 3) / 4)
      val expect = (0 until r.n_frames).filter(_ % 4 == 0)
        .map(i => lumSum(4, 4, r.media_id + i)).sum
      assert(r.sampled_lum_sum == expect,
        s"sampled pixel sums mismatch for media ${r.media_id}")
    }
  }

  test("phash samples the decoded 8x8 grid exactly per the paint rule") {
    for ((w, h, seed) <- Seq((16, 16, 0L), (135, 111, 119L), (16, 112, 44L))) {
      val (lo, hi) = Codec.phash(Codec.encodePng(w, h, seed))
      var (elo, ehi) = (0L, 0L)
      for (i <- 0 until 8; j <- 0 until 8) {
        val v = (i * (w / 8) + j * (h / 8) + seed) % 256
        if (v >= 128) {
          val b = i * 8 + j
          if (b < 32) elo |= 1L << b else ehi |= 1L << (b - 32)
        }
      }
      assert((lo, hi) == ((elo, ehi)), s"phash mismatch for ${(w, h, seed)}")
      assert(lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32),
        "halves must never touch the sign bit")
    }
  }

  test("phash banding is lossless at hamming<=3: equals brute-force pairs") {
    val hashes = Multimodal.mmPhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (for {
      (a, alo, ahi) <- hashes; (b, blo, bhi) <- hashes if a < b
      d = java.lang.Long.bitCount(alo ^ blo) + java.lang.Long.bitCount(ahi ^ bhi)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.mmPhashDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      "banded candidates + verify must equal the all-pairs result (pigeonhole)")
  }

  test("mm_audio decodes real s16le PCM bytes back to the waveform rule") {
    val rows = Multimodal.mmAudio(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n, nf) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n == 1024 + id % 1024, "sample count from the synth rule")
      assert(nf == (n + 255) / 256, "ceil frame count")
      // recompute features from the closed-form waveform on the driver
      val xs = (0L until n).map(i => (id * 31 + i) * 2654435761L % 65536 - 32768)
      assert(r.getLong(3) == xs.map(_.abs).max, "peak amplitude")
      assert(r.getLong(4) == xs.map(v => v * v).sum, "total energy")
      val maxFrame = xs.grouped(256).map(_.map(v => v * v).sum).max
      assert(r.getLong(5) == maxFrame, "loudest frame energy")
    }
  }

  test("mm_scene_cut recomputes every adjacent-frame delta from real decodes") {
    val rows = Multimodal.mmSceneCut(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nf, cuts, maxDelta) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nf == 2 + id % 7, "frame count from the synth rule")
      // paint rule: lum(f) = sum over 4x4 of (x + y + id + f) % 256
      val lums = (0L until nf).map { f =>
        (for (x <- 0 until 4; y <- 0 until 4)
          yield (x + y + id + f) % 256).sum
      }
      val deltas = lums.sliding(2).map(p => (p(1) - p(0)).abs).toSeq
      assert(cuts == deltas.count(_ > Multimodal.SceneCutThreshold))
      assert(maxDelta == deltas.max)
    }
    assert(rows.exists(_.getLong(2) > 0), "some videos must have cuts")
    assert(rows.exists(_.getLong(2) == 0), "and some must not")
  }

  test("resize plan preserves aspect and bounds the long side") {
    val out = Multimodal.resizePlan(
      Multimodal.decodeImages(Multimodal.imageTable(spark, sf)), maxSide = 100)
    val rows = out.collect()
    assert(rows.nonEmpty)
    var shrunk = 0
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(5), r.getInt(6))
      assert(math.max(ow, oh) <= 100)
      if (math.max(w, h) <= 100) assert((ow, oh) == ((w, h))) else shrunk += 1
    }
    assert(shrunk > 0, "the dimension spread must exercise the shrink branch")
  }
}
