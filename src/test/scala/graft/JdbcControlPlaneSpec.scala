package graft

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.cdc.{Initializer, JdbcControlPlane, JdbcSeedSource}
import graft.engine.model.{Ccd, Status}
import graft.engine.topics.FileTopicStore

/** Real-DDL control plane over embedded Derby: queue tables, live
  * change-capture triggers (an INSERT into the captured table flows
  * into the queue table through the trigger), the reference's
  * enable/disable/exists/enabled state machine, and the full
  * initializer cycle with both JDBC components on one database. */
class JdbcControlPlaneSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  private val sf = "/root/testdata/sf0.001"

  private def freshDb(): String = {
    val dir = Files.createTempDirectory("graft-derby-cp").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }

  private def loadNation(url: String): Int = {
    val rows = spark.read.parquet(s"$sf/nation.parquet").collect()
    val c = DriverManager.getConnection(url)
    try {
      c.createStatement().execute(
        "CREATE TABLE NATION (n_nationkey INTEGER, n_name VARCHAR(64), n_regionkey INTEGER)")
      val ps = c.prepareStatement("INSERT INTO NATION VALUES (?, ?, ?)")
      rows.foreach { r =>
        ps.setInt(1, r.getAs[Int]("n_nationkey"))
        ps.setString(2, r.getAs[String]("n_name"))
        ps.setInt(3, r.getAs[Int]("n_regionkey"))
        ps.addBatch()
      }
      ps.executeBatch(); rows.length
    } finally c.close()
  }

  private def mkPlane(url: String) = new JdbcControlPlane(url,
    Map("tpch.nation" -> (("NATION", "n_nationkey"))))

  private def queueRows(url: String, queueTable: String): Seq[String] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        s"SELECT msg FROM $queueTable ORDER BY msg")
      val b = Seq.newBuilder[String]
      while (rs.next()) b += rs.getString(1)
      b.result()
    } finally c.close()
  }

  test("trigger lifecycle: real DDL, live capture on insert, disable stops it") {
    val url = freshDb()
    loadNation(url)
    val plane = mkPlane(url)
    plane.createQueue("q_nation", "mq_q_nation")
    assert(plane.queueExists("q_nation") && !plane.queueExists("other"))
    assert(!plane.triggerExists("tpch.nation"))
    plane.createTrigger("tpch.nation", "q_nation", "mq_q_nation")
    assert(plane.triggerExists("tpch.nation"))
    assert(!plane.triggerEnabled("tpch.nation"), "created disabled")

    plane.enableTrigger("tpch.nation")
    assert(plane.triggerEnabled("tpch.nation"))
    // a live INSERT flows through the trigger into the queue table
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute(
      "INSERT INTO NATION VALUES (99, 'ATLANTIS', 0)")
    finally c.close()
    assert(queueRows(url, "mq_q_nation") == Seq("99"), "captured key routed to queue")

    plane.disableTrigger("tpch.nation")
    assert(!plane.triggerEnabled("tpch.nation"))
    assert(plane.triggerExists("tpch.nation"), "registration outlives disable")
    val c2 = DriverManager.getConnection(url)
    try c2.createStatement().execute(
      "INSERT INTO NATION VALUES (100, 'ELDORADO', 0)")
    finally c2.close()
    assert(queueRows(url, "mq_q_nation") == Seq("99"), "disabled trigger captures nothing")

    plane.clearQueue("q_nation")
    assert(queueRows(url, "mq_q_nation").isEmpty, "clear_queue.sql semantics")
  }

  test("hostile queue names become error states, never DDL") {
    val url = freshDb()
    loadNation(url)
    val plane = mkPlane(url)
    val src = new JdbcSeedSource(spark, url,
      Map("tpch.nation" -> JdbcSeedSource.TableSpec(
        "NATION", Seq("n_nationkey"), "n_nationkey")))
    val root = Files.createTempDirectory("graft-cp-inj").toString
    val store = new FileTopicStore(spark, root, sleeper = _ => ())
    val init = new Initializer(spark, plane, store, "control", src.view,
      now = () => new Timestamp(1700000001000L))
    store.create("control")
    // queue-table name carrying SQL — interpolating it would execute DDL
    val states = init.process(Ccd("tpch.nation", "q_nation",
      "mq (q VARCHAR(9)); DROP TABLE NATION; --",
      None, Status.Submitted, new Timestamp(1700000000000L)))
    assert(states.last.status == Status.Error,
      s"got: ${states.map(_.status)}")
    assert(states.last.error.exists(_.contains("not a valid identifier")))
    // the captured table survived
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT count(*) FROM NATION")
      rs.next(); assert(rs.getLong(1) == 25)
    } finally c.close()
  }

  test("full initializer cycle with JDBC control plane + JDBC seed source") {
    val url = freshDb()
    loadNation(url)
    val plane = mkPlane(url)
    val src = new JdbcSeedSource(spark, url,
      Map("tpch.nation" -> JdbcSeedSource.TableSpec(
        "NATION", Seq("n_nationkey"), "n_nationkey")))
    val root = Files.createTempDirectory("graft-cp-init").toString
    val store = new FileTopicStore(spark, root, sleeper = _ => ())
    val init = new Initializer(spark, plane, store, "control", src.view,
      now = () => new Timestamp(1700000001000L))
    store.create("control")
    try {
      val states = init.process(Ccd("tpch.nation", "q_nation", "mq_q_nation",
        None, Status.Submitted, new Timestamp(1700000000000L)))
      assert(states.map(_.status).take(4) == Seq(Status.TriggerCreated,
        Status.QueueCreated, Status.TopicCreated, Status.Prepared))
      assert(states.last.status == Status.Active)
      assert(store.readAll("q_nation").count() == 25, "topic seeded over JDBC")
      assert(plane.triggerEnabled("tpch.nation"), "trigger armed before snapshot")
    } finally src.release("tpch.nation")
  }
}
