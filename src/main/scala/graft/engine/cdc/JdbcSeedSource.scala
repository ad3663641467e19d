package graft.engine.cdc

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC-backed seed source — the engine port of the reference's bulk
  * path (seed_store.clj:96-115, create_seed_view.sql:1-8,
  * drop_seed_view.sql:1-8): a server-side SEED VIEW exposing
  * `cdc.`-prefixed metadata columns over the captured table, read as a
  * partitioned Spark JDBC relation, and dropped again after seeding.
  *
  * Scale design: the read uses
  * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`, so the
  * snapshot runs as N concurrent range-bounded cursors (`WHERE pc >= x
  * AND pc < y`) instead of the reference's single driver-side
  * result-set loop — the JDBC analog of a parallel scan, and the only
  * shape that seeds a large table in reasonable time. Each partition
  * streams straight into the topic append; nothing is collected.
  *
  * View lifecycle mirrors the reference: [[view]] (re)creates the seed
  * view idempotently (drop-if-exists, then create); [[release]] drops
  * it and swallows errors exactly like the reference's finally-block
  * drop. The embedded-Derby spec exercises the full
  * create→read→seed→drop cycle (seed_store_test.clj:59-79).
  */
object JdbcSeedSource {
  /** One capturable table.
    * @param dbTable         physical table name in the database
    * @param pkCols          primary-key columns (become `cdc.id.*`)
    * @param partitionColumn numeric column the parallel scan ranges over */
  final case class TableSpec(dbTable: String, pkCols: Seq[String], partitionColumn: String)
}

class JdbcSeedSource(
    spark: SparkSession,
    url: String,
    tables: Map[String, JdbcSeedSource.TableSpec],
    userId: String = "cdc-init",
    numPartitions: Int = 4) {

  import JdbcSeedSource.TableSpec

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def viewName(spec: TableSpec): String = s"GRAFT_SEED_${spec.dbTable}"

  /** Physical column names of a table, in ordinal order. The metadata
    * lookup is case-sensitive while SQL identifiers are not: Derby
    * stores unquoted names uppercase, so match that (a lowercase
    * dbTable would otherwise silently yield ZERO data columns). */
  private def tableColumns(c: Connection, dbTable: String): Seq[String] = {
    val rs = c.getMetaData.getColumns(null, null, dbTable.toUpperCase, null)
    val cols = Seq.newBuilder[(Int, String)]
    while (rs.next())
      cols += rs.getInt("ORDINAL_POSITION") -> rs.getString("COLUMN_NAME")
    rs.close()
    cols.result().sortBy(_._1).map(_._2)
  }

  /** (Re)create the seed view for `table`: quoted `cdc.`-prefixed
    * metadata columns + the table's data columns lowercased (matching
    * the engine's column-name convention, SeedViews.forTable). */
  private def createSeedView(spec: TableSpec, table: String): Unit = withConn { c =>
    try c.createStatement().execute(s"DROP VIEW ${viewName(spec)}")
    catch { case _: Exception => () } // idempotent create
    val data = tableColumns(c, spec.dbTable)
    val heads =
      Seq("cdc.type", "cdc.table", "cdc.info.user_id") ++
        spec.pkCols.map(pk => s"cdc.id.$pk") ++
        data.map(_.toLowerCase)
    val selects =
      Seq(s"'insert'", s"'$table'", s"'$userId'") ++
        // numeric → string must go through CHAR in Derby (no direct
        // INTEGER→VARCHAR cast); RTRIM strips the CHAR padding
        spec.pkCols.map(pk => s"RTRIM(CAST(CAST($pk AS CHAR(64)) AS VARCHAR(64)))") ++
        data
    c.createStatement().execute(
      s"""CREATE VIEW ${viewName(spec)} (${heads.map(h => s""""$h"""").mkString(", ")})
         |AS SELECT ${selects.mkString(", ")} FROM ${spec.dbTable}""".stripMargin)
  }

  /** Seed-view frame for a captured table, or None when unknown —
    * plugs straight into [[Initializer]]'s `seedView` slot. */
  def view(table: String): Option[DataFrame] = tables.get(table).map { spec =>
    createSeedView(spec, table)
    val (lo, hi) = withConn { c =>
      val rs = c.createStatement().executeQuery(
        s"SELECT MIN(${spec.partitionColumn}), MAX(${spec.partitionColumn}) FROM ${spec.dbTable}")
      rs.next(); (rs.getLong(1), rs.getLong(2))
    }
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", viewName(spec))
      .option("partitionColumn", spec.partitionColumn)
      .option("lowerBound", lo)
      .option("upperBound", math.max(hi + 1, lo + 1)) // upper bound is exclusive
      .option("numPartitions", numPartitions)
      .load()
  }

  /** Drop the seed view, best-effort (the reference drops in `finally`
    * and swallows failures, seed_store.clj:111-113). */
  def release(table: String): Unit = tables.get(table).foreach { spec =>
    try withConn(_.createStatement().execute(s"DROP VIEW ${viewName(spec)}"))
    catch { case _: Exception => () }
  }
}
