package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkTest {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // same extensions as GraftSession: native functions + BandJoinRule
      .config("spark.sql.extensions",
        classOf[graft.engine.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "4")
      // session contract, same as GraftSession: events.parquet is
      // TIMESTAMP(NANOS) and streaming reads need the flag live
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
