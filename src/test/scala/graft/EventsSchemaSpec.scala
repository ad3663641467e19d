package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.events` must normalize `ts` to TIMESTAMP_NTZ microseconds
  * whatever physical type the testdata generator wrote — generations
  * have used BOTH parquet TIMESTAMP(NANOS) (read as raw long via
  * nanosAsLong) and TIMESTAMP_NTZ micros. The live testdata only
  * exercises one branch at a time, so this spec synthesizes the other
  * branch's layout and proves both decode to the same instants. */
class EventsSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("nanos-as-long and ntz-micros generations decode identically") {
    import spark.implicits._
    val micros = Seq(0L, 1L, 999999L, 1723500000000000L, 1723500000123456L)
    val dir = Files.createTempDirectory("events_schema").toFile
    val nanosDir = new java.io.File(dir, "nanos")
    val ntzDir = new java.io.File(dir, "ntz")

    // nanos generation: ts is a raw long column of nanoseconds (what
    // nanosAsLong surfaces for parquet TIMESTAMP(NANOS))
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L, i.toLong, "t", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(new java.io.File(nanosDir, "events.parquet").getPath)

    // micros generation: ts is TIMESTAMP_NTZ
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "t", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"us").cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(new java.io.File(ntzDir, "events.parquet").getPath)

    def load(d: java.io.File): Seq[(Long, Long)] =
      graft.engine.Tables.events(spark, d.getPath)
        .select($"event_id",
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq

    val a = load(nanosDir)
    val b = load(ntzDir)
    assert(a == b, "both generations must decode to identical microseconds")
    assert(a.map(_._2) == micros.indices.map(i => micros(i)).toSeq)

    // both must present ts as TIMESTAMP_NTZ (the DuckDB-naive contract)
    for (d <- Seq(nanosDir, ntzDir))
      assert(graft.engine.Tables.events(spark, d.getPath)
        .schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
  }
}
