package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-format breadth: the engine's frames round-trip through CSV
  * and JSON-lines with explicit schemas — the interchange formats a
  * real ingestion edge feeds the engine besides parquet. Timestamps
  * are carried as ISO strings (CSV/JSON have no native timestamp) and
  * restored via the declared read schema. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def events = {
    import spark.implicits._
    graft.engine.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value",
        // µs-precision ISO string: survives both text formats exactly
        date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
  }
  private def date_format(c: org.apache.spark.sql.Column, f: String) =
    org.apache.spark.sql.functions.date_format(c, f)

  private def roundTrip(format: String): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-$format").toString + "/out"
    val src = events
    src.write.format(format).option("header", "true").save(dir)
    val back = spark.read.format(format)
      .option("header", "true")
      .schema(src.schema) // explicit schema: no inference drift
      .load(dir)
    val a = src.orderBy($"event_id").collect().toSeq
    val b = back.orderBy($"event_id").collect().toSeq
    assert(a == b, s"$format round-trip must be lossless")
  }

  test("events round-trip losslessly through CSV")(roundTrip("csv"))
  test("events round-trip losslessly through JSON-lines")(roundTrip("json"))
  test("events round-trip losslessly through ORC")(roundTrip("orc"))

  test("ORC scans push filters down like parquet (columnar source parity)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orcp").toString + "/ev"
    events.write.format("orc").save(dir)
    val q = spark.read.format("orc").schema(events.schema).load(dir)
      .filter($"user_id" === 7L).select($"event_id", $"user_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      s"ORC scan must push the user_id filter:\n$plan")
    assert(q.count() == events.filter($"user_id" === 7L).count())
  }

  test("a query runs identically over the parquet and CSV copies") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-csvq").toString + "/ev"
    events.write.format("csv").option("header", "true").save(dir)
    val csv = spark.read.format("csv").option("header", "true")
      .schema(events.schema).load(dir)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"event_type").count().orderBy($"event_type").collect().toSeq
    assert(agg(csv) == agg(events.toDF()),
      "the engine is format-agnostic above the scan")
  }
}
