package graft.engine.cdc

import scala.collection.mutable

/** Database-side control objects the initializer must ensure exist:
  * the change-capture trigger and the message queue (reference
  * protocols.clj:6-22, change_data_store.clj:12-68 — PL/SQL DDL in the
  * reference, a catalog abstraction here; there is no Oracle in this
  * environment, and the dataflow only needs exists/create/clear/
  * enable/disable semantics plus fault behavior).
  */
trait ControlPlane {
  def triggerExists(table: String): Boolean
  /** Create the change-capture trigger for `table`, routing captured
    * changes to `queue` in `queueTable` (reference
    * create_trigger.sql:1-10 — `create_cdc_trigger(schema, table,
    * queue, …)` takes the queue for exactly this reason). Created
    * DISABLED; [[enableTrigger]] arms it. */
  def createTrigger(table: String, queue: String, queueTable: String): Unit
  def enableTrigger(table: String): Unit
  def disableTrigger(table: String): Unit
  def triggerEnabled(table: String): Boolean
  def queueExists(queue: String): Boolean
  def createQueue(queue: String, queueTable: String): Unit
  def clearQueue(queue: String): Unit
}

/** In-memory control plane with injectable faults — the engine-side
  * port of the reference's DummyDatabase (test_dummies.clj:38-76,
  * `error-on!`). Thread-safe enough for the sequential worker loop
  * (the reference processes CCDs strictly one at a time,
  * initializer.clj:41-68).
  */
class InMemoryControlPlane(
    failures: String => Boolean = _ => false)
  extends ControlPlane {

  private def check(op: String): Unit =
    if (failures(op)) throw new RuntimeException(s"injected failure: $op")

  val triggers: mutable.Map[String, Boolean] = mutable.Map() // table -> enabled
  val queues: mutable.Map[String, String] = mutable.Map()    // queue -> queueTable
  val cleared: mutable.Buffer[String] = mutable.Buffer()

  def triggerExists(table: String): Boolean = { check("trigger-exists"); triggers.contains(table) }
  def createTrigger(table: String, queue: String = "", queueTable: String = ""): Unit = {
    check("create-trigger"); triggers(table) = false
  }
  def enableTrigger(table: String): Unit = {
    check("enable-trigger")
    require(triggers.contains(table), s"no trigger for $table")
    triggers(table) = true
  }
  def disableTrigger(table: String): Unit = { check("disable-trigger"); triggers(table) = false }
  def triggerEnabled(table: String): Boolean = triggers.getOrElse(table, false)
  def queueExists(queue: String): Boolean = { check("queue-exists"); queues.contains(queue) }
  def createQueue(queue: String, queueTable: String): Unit = { check("create-queue"); queues(queue) = queueTable }
  def clearQueue(queue: String): Unit = { check("clear-queue"); cleared += queue }
}

/** Identifier utilities — port of the reference's sql/util.clj:8-57.
  * Oracle-style identifiers: `schema.object`, 30-char limit era. */
object Identifiers {
  private val Ref = """^([A-Za-z][A-Za-z0-9_$#]*)\.([A-Za-z][A-Za-z0-9_$#]*)$""".r

  /** Split a `schema.table` reference; the schema part is required
    * (reference sql/util.clj:47-57 `split-table-ref`, throws). */
  def splitTableRef(ref: String): (String, String) = ref match {
    case Ref(schema, obj) => (schema, obj)
    case _ => throw new IllegalArgumentException(
      s"table reference must be schema-qualified: '$ref'")
  }

  /** `strip-schema` (sql/util.clj:31-36). */
  def stripSchema(ref: String): String = splitTableRef(ref)._2

  /** Alias of [[stripSchema]] under a validation-friendly name (used by
    * checkCcd, which converts the throw into an error state). */
  def stripTableSchema(ref: String): String = stripSchema(ref)

  /** `mq-table` (sql/util.clj:38-46): message-queue table name. */
  def mqTable(ref: String): String = "mq_" + stripSchema(ref)

  /** Object names longer than this need an alias (reference
    * core.clj:50-54: queue names get suffixes within Oracle's 30-char
    * identifier budget). */
  val maxUnaliasedLength = 22
}
