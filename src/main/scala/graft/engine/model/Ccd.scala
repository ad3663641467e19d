package graft.engine.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Change Capture Definition — the reference's control record
  * (reference core.clj:38-54, 107-119; FIXTURES.md A.1).
  *
  * One CCD describes one table whose changes are to be captured: the
  * source table, the queue (== topic) its changes flow to, and the
  * lifecycle status of the initialization state machine.
  */
case class Ccd(
    table: String,
    queue: String,
    queueTable: String,
    tableAlias: Option[String],
    status: String,
    timestamp: Timestamp,
    /** [seeded, total] — present only while status == seeding
      * (reference core.clj:140-144, 169). */
    progress: Option[Seq[Long]] = None,
    /** error message — present only when status == error
      * (reference core.clj:73-75). */
    error: Option[String] = None)

object Status {
  /** Lifecycle (reference core.clj:63-76,140-151): submitted →
    * (trigger-created? → queue-created? → topic-created?) → prepared →
    * seeding* → active | error. Creation statuses are emitted only when
    * the object did not already exist (core.clj:84-95). */
  val Submitted = "submitted"
  val TriggerCreated = "trigger-created"
  val QueueCreated = "queue-created"
  val TopicCreated = "topic-created"
  val Prepared = "prepared"
  val Seeding = "seeding"
  val Active = "active"
  val Error = "error"

  /** Terminal states — never re-initialized on restart
    * (reference initializer.clj:21-22 `non-initializable-statuses`). */
  val terminal: Set[String] = Set(Active, Error)

  val all: Seq[String] = Seq(Submitted, TriggerCreated, QueueCreated,
    TopicCreated, Prepared, Seeding, Active, Error)

  /** Order of the state machine, for validity checks in tests. */
  val rank: Map[String, Int] = all.zipWithIndex.toMap
}

object Ccd {
  /** Control-topic JSON schema (FIXTURES.md A.1). Field names use the
    * reference's kebab-case JSON keys. */
  val jsonSchema: StructType = StructType(Seq(
    StructField("table", StringType),
    StructField("queue", StringType),
    StructField("queue-table", StringType),
    StructField("table-alias", StringType),
    StructField("status", StringType),
    StructField("timestamp", StringType),
    StructField("progress", ArrayType(LongType)),
    StructField("error", StringType)))
}
