package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting, demonstrated live: the engine's session
  * config (GraftSession: adaptive + skewJoin enabled) must actually
  * split a pathologically hot key at runtime — the 100 TB behavior a
  * plan-shape assertion can't show. Thresholds are lowered to make the
  * tiny local build exhibit what a production partition would. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("AQE splits a hot-key sort-merge join partition at runtime") {
    SparkTest.confLock.synchronized {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption.filter(_ != null))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      // force a shuffle join: broadcast would hide the skew machinery
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // 100k rows, 99% on ONE key — the hot-user shape
      val fact = spark.range(100000)
        .select(when($"id" % 100 === 0, $"id" % 40).otherwise(lit(7L)).as("k"),
          concat(lit("payload-padding-padding-padding-"), $"id").as("payload"))
      val dim = spark.range(40).select($"id".as("k"), ($"id" * 10).as("attr"))
      val joined = fact.join(dim, "k")
      // execute THIS QueryExecution so its adaptive plan finalizes
      // (count() would plan a separate query and leave this one cold)
      val qe = joined.queryExecution
      val n = qe.toRdd.count()
      assert(n == 100000L, "every fact row matches exactly one dim row")

      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot partition as skewed in the final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
    }
  }
}
