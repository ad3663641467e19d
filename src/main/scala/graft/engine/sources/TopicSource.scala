package graft.engine.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.topics.FileTopicStore

/** DataSource V2 connector for file-backed topics — the engine's
  * native `sources/` surface (Kafka-consumer analog of reference
  * topic reads, topic_store.clj + protocols.clj:6-22):
  *
  * {{{
  *   spark.read.format("graft.engine.sources.TopicSource")
  *     .load(topicDir)          // (key, value, partition, offset, ts)
  * }}}
  *
  *  - **one InputPartition per log file** — scan parallelism follows
  *    the append history, no single-task reads
  *  - **predicate pushdown** on `partition` and `offset`
  *    (`SupportsPushDownFilters`): a consumer's "seek to offset /
  *    read one partition" never deserializes skipped messages — the
  *    reader drops them at parse time, before row materialization
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a
  *    key-only compaction scan materializes one column, not five
  *
  * Readers parse with Jackson directly (no inner Spark session) and
  * emit `InternalRow`s in the pruned schema. TopicSourceSpec proves
  * byte-equality with the `spark.read.json` path and asserts the
  * pushdown reaches the scan.
  */
class TopicSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileTopicStore.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TopicTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class TopicTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_topic($dir)"
  override def schema(): StructType = FileTopicStore.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TopicScanBuilder(dir,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt))
}

private[sources] class TopicScanBuilder(dir: String,
    maxFilesPerTrigger: Option[Int] = None) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = FileTopicStore.schema
  private var pushed: Array[Filter] = Array.empty

  /** A filter is pushable when the reader can evaluate it exactly on
    * the (partition, offset) coordinates before row materialization. */
  private def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => a == "partition" || a == "offset"
    case GreaterThan("offset", _) | GreaterThanOrEqual("offset", _) => true
    case LessThan("offset", _) | LessThanOrEqual("offset", _) => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (p, rest) = filters.partition(pushable)
    pushed = p
    rest // Spark keeps evaluating these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new TopicScan(dir, required, pushed, maxFilesPerTrigger)
}

private[sources] class TopicScan(dir: String, required: StructType,
    pushed: Array[Filter],
    maxFilesPerTrigger: Option[Int] = None) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_topic dir=$dir, columns=[${required.fieldNames.mkString(",")}], " +
      s"pushed=[${pushed.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Array.empty
    else {
      val ls = Files.list(p)
      try ls.iterator().asScala
        .filter(_.toString.endsWith(".json"))
        .map(f => TopicFilePartition(f.toString): InputPartition)
        .toArray
      finally ls.close()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TopicReaderFactory(required.fieldNames, pushed)

  override def toMicroBatchStream(checkpointLocation: String)
      : streaming.MicroBatchStream =
    new TopicMicroBatchStream(dir, required.fieldNames, pushed, maxFilesPerTrigger)
}

/** Streaming tail of a topic directory as a V2 MicroBatchStream: the
  * offset is the SET of consumed log files (serialized into the
  * checkpoint, like the Kafka source's partition-offset map), and each
  * micro-batch plans exactly the set difference end − start — so
  * recovery is ordering-independent: however a restarted stream
  * re-lists the directory, already-committed files are never
  * re-planned and new ones never skipped. Appends only add files;
  * storage compaction must not run under a live tail (see
  * FileTopicStore.compact). Pushed offset/partition predicates apply
  * inside the readers exactly as in batch. */
private[sources] class TopicMicroBatchStream(dir: String, columns: Array[String],
    pushed: Array[Filter], maxFilesPerTrigger: Option[Int] = None)
  extends streaming.MicroBatchStream with streaming.SupportsAdmissionControl {
  import com.fasterxml.jackson.databind.ObjectMapper

  private val mapper = new ObjectMapper()

  private def listFiles(): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val ls = Files.list(p)
      try ls.iterator().asScala
        .filter(_.toString.endsWith(".json"))
        .map(_.toString).toSeq.sorted
      finally ls.close()
    }
  }

  override def initialOffset(): streaming.Offset = TopicStreamOffset(Seq.empty)
  override def latestOffset(): streaming.Offset = TopicStreamOffset(listFiles())

  /** Admission control (`maxFilesPerTrigger` option — same knob as the
    * store's JSON readStream): a large backlog is admitted N files per
    * micro-batch instead of flooding the first one, the engine analog
    * of the reference's bounded work queue (initializer.clj:87). */
  override def getDefaultReadLimit: streaming.ReadLimit =
    maxFilesPerTrigger.map(streaming.ReadLimit.maxFiles)
      .getOrElse(streaming.ReadLimit.allAvailable())

  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    val seen = start.asInstanceOf[TopicStreamOffset].files
    val newFiles = listFiles().filterNot(seen.toSet)
    val admitted = limit match {
      case m: streaming.ReadMaxFiles => newFiles.take(m.maxFiles)
      case _ => newFiles
    }
    TopicStreamOffset(seen ++ admitted)
  }

  override def reportLatestOffset(): streaming.Offset =
    TopicStreamOffset(listFiles())

  override def deserializeOffset(json: String): streaming.Offset =
    TopicStreamOffset(
      mapper.readValue(json, classOf[Array[String]]).toSeq)

  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[TopicStreamOffset].files.toSet
    end.asInstanceOf[TopicStreamOffset].files
      .filterNot(seen)
      .map(f => TopicFilePartition(f): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TopicReaderFactory(columns, pushed)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class TopicStreamOffset(files: Seq[String])
  extends streaming.Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(files.toArray)
  }
}

private[sources] case class TopicFilePartition(file: String) extends InputPartition

private[sources] class TopicReaderFactory(columns: Array[String],
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TopicFileReader(partition.asInstanceOf[TopicFilePartition].file,
      columns, pushed)
}

private[sources] class TopicFileReader(file: String, columns: Array[String],
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

  private val mapper = new ObjectMapper()
  private val lines = Files.lines(Paths.get(file))
  private val it = lines.iterator()
  private var current: InternalRow = _

  private def longOf(v: Any): Long = v match {
    case n: Number => n.longValue()
    case other => other.toString.toLong
  }

  /** SQL comparison semantics: a predicate on a MISSING field is null,
    * i.e. the row is dropped — never matched via a sentinel. */
  private def accept(partition: Option[Int], offset: Option[Long]): Boolean =
    pushed.forall {
      case EqualTo("partition", v) => partition.exists(_ == longOf(v))
      case EqualTo("offset", v) => offset.exists(_ == longOf(v))
      case GreaterThan("offset", v) => offset.exists(_ > longOf(v))
      case GreaterThanOrEqual("offset", v) => offset.exists(_ >= longOf(v))
      case LessThan("offset", v) => offset.exists(_ < longOf(v))
      case LessThanOrEqual("offset", v) => offset.exists(_ <= longOf(v))
      case _ => true
    }

  /** Timestamp → Spark micros; Spark's JSON writer emits ISO-8601 with
    * offset (UTC session), e.g. 2026-08-12T10:05:27.123Z. */
  private def tsMicros(s: String): Long = {
    val instant =
      try java.time.OffsetDateTime.parse(s).toInstant
      catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC)
      }
    instant.getEpochSecond * 1000000L + instant.getNano / 1000L
  }

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        val node: JsonNode = mapper.readTree(line)
        // absent fields stay null all the way to the output row, exactly
        // like the spark.read.json path — no sentinels
        val partition =
          if (node.hasNonNull("partition")) Some(node.get("partition").asInt) else None
        val offset =
          if (node.hasNonNull("offset")) Some(node.get("offset").asLong) else None
        if (accept(partition, offset)) {
          val values: Array[Any] = columns.map {
            case "key" =>
              if (node.hasNonNull("key")) UTF8String.fromString(node.get("key").asText) else null
            case "value" =>
              if (node.hasNonNull("value")) UTF8String.fromString(node.get("value").asText) else null
            case "partition" => partition.map(Int.box).orNull
            case "offset" => offset.map(Long.box).orNull
            case "ts" =>
              if (node.hasNonNull("ts")) tsMicros(node.get("ts").asText): java.lang.Long else null
          }
          current = InternalRow.fromSeq(values.toIndexedSeq)
        }
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
