package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.cdc.Transforms

/** Golden-fixture tests for the CDC row transforms, reproducing the
  * reference's worked examples (FIXTURES.md A.2–A.4, from
  * seed_store_test.clj:59-104).
  */
class CdcTransformsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def seedViewRow = {
    // FIXTURES.md A.2 — the flat seed-view row golden example.
    Seq((
      "insert", "ifsapp.shop_ord_tab", "ifsapp",
      "2015-11-13T12:30:56.467000+00:00",
      "123456", "*", "*",
      "123456", "*", "*"))
      .toDF("cdc.type", "cdc.table", "cdc.info.user_id", "cdc.info.timestamp",
        "cdc.id.order_no", "cdc.id.release_no", "cdc.id.sequence_no",
        "order_no", "release_no", "sequence_no")
  }

  test("seedRowToDmlMsg nests by cdc.-prefix convention (FIXTURES A.3)") {
    val dml = Transforms.seedRowToDmlMsg(seedViewRow)
    val row = dml.collect().head
    val schema = dml.schema
    assert(schema.fieldNames.toSet === Set("type", "table", "info", "id", "data"))
    assert(row.getAs[String]("type") === "insert")
    assert(row.getAs[String]("table") === "ifsapp.shop_ord_tab")
    val info = row.getStruct(schema.fieldIndex("info"))
    assert(info.getAs[String]("user_id") === "ifsapp")
    assert(info.getAs[String]("timestamp") === "2015-11-13T12:30:56.467000+00:00")
    val id = row.getStruct(schema.fieldIndex("id"))
    assert(id.getAs[String]("order_no") === "123456")
    assert(id.getAs[String]("release_no") === "*")
    assert(id.getAs[String]("sequence_no") === "*")
    val data = row.getStruct(schema.fieldIndex("data"))
    assert(data.getAs[String]("order_no") === "123456")
    assert(data.getAs[String]("release_no") === "*")
    assert(data.getAs[String]("sequence_no") === "*")
  }

  test("dmlMsgToSeedMsg: key = sorted flattened id pairs (FIXTURES A.4)") {
    // id {order_no: "123456", release_no: "7", sequence_no: "*"} →
    // key ["order_no","123456","release_no","7","sequence_no","*"]
    val dml = Transforms.seedRowToDmlMsg(
      Seq(("insert", "123456", "7", "*", 1))
        .toDF("cdc.type", "cdc.id.order_no", "cdc.id.release_no",
          "cdc.id.sequence_no", "x"))
    val msg = Transforms.dmlMsgToSeedMsg(dml).collect().head
    assert(msg.getAs[String]("key") ===
      """["order_no","123456","release_no","7","sequence_no","*"]""")
    val value = msg.getAs[String]("value")
    // value is the JSON of the whole DML message
    assert(value.contains(""""type":"insert""""))
    assert(value.contains(""""id":{"""))
    assert(value.contains(""""data":{"x":1}"""))
  }

  test("id pairs are sorted by column name regardless of input order") {
    val dml = Transforms.seedRowToDmlMsg(
      Seq(("9", "1", "v")).toDF("cdc.id.zz", "cdc.id.aa", "payload"))
    val msg = Transforms.dmlMsgToSeedMsg(dml).collect().head
    assert(msg.getAs[String]("key") === """["aa","1","zz","9"]""")
  }

  test("lastStatePerKey keeps the max-ordered row per key") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"),
      (2L, 5L, "x")).toDF("k", "off", "v")
    val got = Transforms.lastStatePerKey(Seq("k"), Seq("off"))(df)
      .orderBy("k").collect()
    assert(got.map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((1L, "c"), (2L, "x")))
  }

  test("dropTerminal rejects terminal statuses only") {
    val df = Seq(("a", "active"), ("b", "error"), ("c", "seeding"),
      ("d", "submitted")).toDF("k", "status")
    val got = Transforms.dropTerminal("status", Set("active", "error"))(df)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got === Seq("c", "d"))
  }

  test("updateStatus merges status + fresh timestamp") {
    import org.apache.spark.sql.functions._
    val df = Seq(("t1", "submitted")).toDF("table", "status")
    val got = Transforms.updateStatus("prepared")(df).collect().head
    assert(got.getAs[String]("status") === "prepared")
    assert(got.getAs[java.sql.Timestamp]("timestamp") != null)
  }
}
