package graft

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.cdc.{InMemoryControlPlane, Initializer, JdbcSeedSource, SeedViews}
import graft.engine.model.{Ccd, Status}
import graft.engine.topics.FileTopicStore

/** End-to-end JDBC bulk path over embedded Derby (the reference's
  * Oracle seed store, seed_store_test.clj:59-79): create seed view →
  * partitioned scan → topic seeding → drop view. The seeded messages
  * must be byte-identical to the parquet-backed path's — same
  * transforms, same JSON — proving the source is a drop-in seedView
  * implementation. */
class JdbcSeedSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  private val sf = "/root/testdata/sf0.001"

  private def freshDerby(): String = {
    val dir = Files.createTempDirectory("graft-derby").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }

  /** Load nation.parquet into a Derby NATION table. */
  private def loadNation(url: String): Int = {
    val rows = spark.read.parquet(s"$sf/nation.parquet").collect()
    val c = DriverManager.getConnection(url)
    try {
      c.createStatement().execute(
        """CREATE TABLE NATION (
          |  n_nationkey INTEGER, n_name VARCHAR(64), n_regionkey INTEGER)""".stripMargin)
      val ps = c.prepareStatement("INSERT INTO NATION VALUES (?, ?, ?)")
      rows.foreach { r =>
        ps.setInt(1, r.getAs[Int]("n_nationkey"))
        ps.setString(2, r.getAs[String]("n_name"))
        ps.setInt(3, r.getAs[Int]("n_regionkey"))
        ps.addBatch()
      }
      ps.executeBatch()
      rows.length
    } finally c.close()
  }

  private def mkSource(url: String) = new JdbcSeedSource(spark, url,
    Map("tpch.nation" -> JdbcSeedSource.TableSpec(
      "NATION", Seq("n_nationkey"), "n_nationkey")))

  test("seed view: cdc-prefixed columns, partitioned scan, drop on release") {
    val url = freshDerby()
    val n = loadNation(url)
    val src = mkSource(url)
    val df = src.view("tpch.nation").get
    assert(df.columns.take(4).toSeq ==
      Seq("cdc.type", "cdc.table", "cdc.info.user_id", "cdc.id.n_nationkey"))
    assert(df.columns.drop(4).toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(df.rdd.getNumPartitions == 4, "range-bounded parallel scan, not one cursor")
    assert(df.count() == n)
    assert(src.view("tpch.nation").get.count() == n, "view (re)create is idempotent")
    src.release("tpch.nation")
    val c = DriverManager.getConnection(url)
    try intercept[Exception](
      c.createStatement().executeQuery("SELECT * FROM GRAFT_SEED_NATION"))
    finally c.close()
    src.release("tpch.nation") // second drop is a swallowed no-op
  }

  test("JDBC-seeded topic is byte-identical to the parquet-backed path") {
    val url = freshDerby()
    loadNation(url)
    val src = mkSource(url)
    val root = Files.createTempDirectory("graft-init-jdbc").toString
    val store = new FileTopicStore(spark, root, sleeper = _ => ())
    val init = new Initializer(spark, new InMemoryControlPlane(_ => false), store,
      "control", src.view, now = () => new Timestamp(1700000001000L))
    store.create("control")
    try {
      val states = init.process(Ccd("tpch.nation", "q_nation", "mq_q_nation",
        None, Status.Submitted, new Timestamp(1700000000000L)))
      assert(states.last.status == Status.Active, s"got: ${states.map(_.status)}")
      val got = store.readAll("q_nation")
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // reference result: the same transforms over the parquet table
      val expected = graft.engine.cdc.Transforms.dmlMsgToSeedMsg(
        graft.engine.cdc.Transforms.seedRowToDmlMsg(SeedViews.forTable(
          spark.read.parquet(s"$sf/nation.parquet"), "tpch.nation",
          Seq("n_nationkey"))))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == expected)
    } finally src.release("tpch.nation")
  }
}
