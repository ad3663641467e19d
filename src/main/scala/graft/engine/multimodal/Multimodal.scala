package graft.engine.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal column plumbing (north-star): media as opaque `binary`
  * columns with typed metadata, processed in partition-batches.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`FakeCodec`) — everything
  * around it is real and load-bearing: the (id, kind, content,
  * meta-struct) schema, binary-column projection/pruning, partition
  * iterator batching via `mapPartitions` (the JVM analog of
  * `mapInPandas` batch processing: one decoder instance per
  * partition, streamed row batches, no per-row setup cost), and
  * fixed-size frame chunking/sampling.
  *
  * Scale notes: content bytes never pass through a shuffle — every
  * transform here is map-only; metadata-only outputs drop the binary
  * column as early as possible so downstream stages shuffle narrow
  * rows. At 100 TB the media table would be parquet with the binary
  * column in its own column chunk, so metadata queries never read
  * bytes at all (column pruning).
  */
object Multimodal {

  /** One media row: bytes + the typed metadata a real pipeline carries. */
  case class Media(media_id: Long, kind: String, content: Array[Byte])
  case class ImageMeta(media_id: Long, width: Int, height: Int, n_pixels: Long)
  case class Frames(media_id: Long, n_frames: Int, sampled_frames: Int, sampled_bytes: Long)

  /** STUB decoder — stands in for an image/audio codec (none in this
    * container). Deterministic: "dimensions" derive from the first
    * bytes, so tests and reruns agree. A real deployment swaps this
    * object for JNI/codec calls without touching the Spark plumbing. */
  object FakeCodec {
    /** ??? real codec goes here — fake "header parse": width/height
      * from the first two bytes, bounded to plausible ranges. */
    def decodeImage(bytes: Array[Byte]): (Int, Int) = {
      val w = 64 + (if (bytes.length > 0) (bytes(0) & 0x7f) else 0)
      val h = 64 + (if (bytes.length > 1) (bytes(1) & 0x7f) else 0)
      (w, h)
    }
    /** ??? real resampler goes here — fake resize keeps aspect. */
    def resize(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      val side = math.max(w, h)
      if (side <= maxSide) (w, h)
      else ((w.toLong * maxSide / side).toInt, (h.toLong * maxSide / side).toInt)
    }
  }

  /** Synthesized media table over `documents`: text bytes stand in for
    * media content (binary column), kind round-robins image/audio/video. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"))

  /** Decode pass: partition-batched stub decode → typed metadata.
    * The binary column is consumed here and does not survive into the
    * output (narrow rows downstream). */
  def decodeImages(media: DataFrame): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder per partition — the mapInPandas batch shape
        rows.map { case (id, bytes) =>
          val (w, h) = FakeCodec.decodeImage(bytes)
          ImageMeta(id, w, h, w.toLong * h)
        }
      }
  }

  /** Frame sampling: chunk content into fixed-size frames, keep every
    * `stride`-th frame. Frame boundaries are byte-offset arithmetic —
    * the real video analog samples keyframes; the plumbing (partition
    * batching, per-frame accounting) is identical. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): Dataset[Frames] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val frames = bytes.grouped(frameBytes).toArray
          val sampled = frames.zipWithIndex.collect { case (f, i) if i % stride == 0 => f }
          Frames(id, frames.length, sampled.length, sampled.map(_.length.toLong).sum)
        }
      }
  }

  /** Resize planning over decoded metadata — pure column arithmetic
    * (the stub keeps it deterministic and oracle-free). */
  def resizePlan(decoded: Dataset[ImageMeta], maxSide: Int = 128): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.map { m =>
      val (w, h) = FakeCodec.resize(m.width, m.height, maxSide)
      (m.media_id, m.width, m.height, w, h)
    }.toDF("media_id", "width", "height", "out_width", "out_height")
  }

  // ---- declared queries ----

  type Q = (SparkSession, String) => DataFrame

  /** Metadata-only pass over the media table: byte length + content
    * digest + kind — never decodes, prunes to the needed columns
    * (DuckDB-oracle-checkable: pure SQL byte semantics). */
  val mmMeta: Q = (s, d) =>
    mediaTable(s, d)
      .select(col("media_id"), col("kind"),
        octet_length(col("content")).as("byte_len"),
        sha2(col("content"), 256).as("digest"))
      .orderBy(col("media_id"))

  /** Stub-decode + resize plan, media_id order — no-oracle (the stub
    * decode is engine-side logic; verified by MultimodalSpec). */
  val mmDecode: Q = (s, d) =>
    resizePlan(decodeImages(mediaTable(s, d))).orderBy(col("media_id"))

  /** Frame sampling accounting — no-oracle (ditto). */
  val mmFrames: Q = (s, d) => {
    import s.implicits._
    sampleFrames(mediaTable(s, d)).toDF().orderBy(col("media_id"))
  }

  /** Exact media dedup by content digest — the blob-level twin of
    * `dedup_exact` (image/audio dedup by byte identity is the first
    * pass of any multimodal pipeline: hash is computed map-side next
    * to the scan, only (digest, id) pairs shuffle — the binary never
    * moves). Survivor = lowest media_id per digest. */
  val mmDedup: Q = (s, d) =>
    mediaTable(s, d)
      .groupBy(sha2(col("content"), 256).as("digest"))
      .agg(org.apache.spark.sql.functions.min(col("media_id")).as("survivor_id"),
        count(lit(1)).as("n_copies"))
      .select(col("survivor_id"), col("n_copies"), col("digest"))
      .orderBy(col("survivor_id"))

  /** Target shard size (bytes) for [[mmShards]]. */
  val ShardBytes = 65536L

  /** WebDataset-style shard assignment: media blobs laid end-to-end in
    * media_id order and assigned to the fixed-size shard their first
    * byte lands in — the layout step that turns a media corpus into
    * trainable tar-shard units. The global byte prefix-sum runs
    * DISTRIBUTED (`PipelineOps.cumBefore`: one range shuffle + a
    * broadcast offset map, never a single-task global window); only
    * (media_id, n_bytes) travels — the binary column never moves. */
  val mmShards: Q = (s, d) =>
    graft.engine.ops.PipelineOps.cumBefore(
        mediaTable(s, d).select(col("media_id"),
          octet_length(col("content")).cast("long").as("n_bytes")),
        "media_id", "n_bytes")
      .select(col("media_id"), col("n_bytes"),
        expr(s"cum_before DIV $ShardBytes").as("shard_id"),
        (col("cum_before") % ShardBytes).as("shard_off"))
      .orderBy(col("media_id"))

  val queries: Map[String, Q] = Map(
    "mm_meta" -> mmMeta,
    "mm_dedup" -> mmDedup,
    "mm_shards" -> mmShards,
    "mm_decode" -> mmDecode,
    "mm_frames" -> mmFrames,
  )

  val oracles: Map[String, String] = Map(
    "mm_shards" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         | c AS (
         |  SELECT media_id, n_bytes,
         |    CAST(COALESCE(SUM(n_bytes) OVER (ORDER BY media_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS cum_before
         |  FROM m)
         |SELECT media_id, n_bytes,
         |  CAST(cum_before // $ShardBytes AS BIGINT) AS shard_id,
         |  CAST(cum_before % $ShardBytes AS BIGINT) AS shard_off
         |FROM c ORDER BY media_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  sha256(text) AS digest
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm_dedup" ->
      """SELECT min(doc_id) AS survivor_id, count(1) AS n_copies,
        |  sha256(text) AS digest
        |FROM documents GROUP BY sha256(text)
        |ORDER BY survivor_id""".stripMargin,
  )
}
