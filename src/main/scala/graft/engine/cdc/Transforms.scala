package graft.engine.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's pure row transforms, re-expressed as plan-level
  * `DataFrame => DataFrame` combinators (no UDFs — everything stays
  * inside whole-stage codegen).
  *
  * Ports:
  *  - [[updateStatus]]      — reference core.clj:9-20
  *  - [[seedRowToDmlMsg]]   — reference seed_store.clj:38-48
  *  - [[dmlMsgToSeedMsg]]   — reference seed_store.clj:50-55
  *  - [[lastStatePerKey]]   — reference initializer.clj:27-39 (compaction)
  *  - [[dropTerminal]]      — reference initializer.clj:21-22,35-37
  */
object Transforms {

  /** Merge a new status + fresh timestamp onto every row
    * (reference core.clj:9-20: `update-status`). Extra attrs (e.g.
    * progress, error) are appended as columns. */
  def updateStatus(status: String, attrs: (String, Column)*)(df: DataFrame): DataFrame =
    attrs.foldLeft(
      df.withColumn("status", lit(status))
        .withColumn("timestamp", current_timestamp())) {
      case (d, (name, c)) => d.withColumn(name, c)
    }

  /** Restructure a flat seed-view row into the nested DML document by
    * the `cdc.`-prefix column-name convention (reference
    * seed_store.clj:38-48; golden fixture FIXTURES.md A.2/A.3):
    *
    *  - `cdc.a.b.c` column → nested path `a.b.c`
    *  - unprefixed column `x` → `data.x`
    *
    * Schema-driven plan construction: we walk `df.schema` once at plan
    * time and emit pure `struct()` columns — the shape is resolved
    * before execution, so this is a zero-cost projection at any scale.
    */
  def seedRowToDmlMsg(df: DataFrame): DataFrame = {
    // Path for every column: cdc-prefixed names split on '.', data.* rest.
    val paths: Seq[(Seq[String], String)] = df.schema.fields.toSeq.map { f =>
      if (f.name.startsWith("cdc.")) (f.name.split('.').toSeq.drop(1), f.name)
      else (Seq("data", f.name), f.name)
    }

    // Recursive tree-build: group by head segment; leaves become column
    // references, interior nodes become struct()s. Field order within a
    // struct is first-appearance order (matches the reference, which
    // assoc-in's in column order).
    def build(entries: Seq[(Seq[String], String)]): Seq[Column] = {
      val heads = entries.map(_._1.head).distinct
      heads.map { h =>
        val sub = entries.filter(_._1.head == h)
        val (leaves, interior) = sub.partition(_._1.size == 1)
        // a leaf and an interior node on the same path (e.g. column
        // `cdc.data` next to unprefixed data columns) cannot both be
        // represented — fail loudly instead of silently dropping data;
        // likewise TWO leaves on the same full path (e.g. unprefixed `x`
        // next to `cdc.data.x`) would overwrite one another
        require(leaves.isEmpty || interior.isEmpty,
          s"column path conflict at '$h': leaf column(s) ${leaves.map(_._2)} " +
            s"collide with nested column(s) ${interior.map(_._2)}")
        require(interior.nonEmpty || leaves.size == 1,
          s"column path conflict at '$h': columns ${leaves.map(_._2)} " +
            s"map to the same leaf path")
        if (interior.isEmpty) col(s"`${leaves.head._2}`").as(h)
        else struct(build(interior.map { case (p, src) => (p.tail, src) }): _*).as(h)
      }
    }

    df.select(build(paths): _*)
  }

  /** Encode a DML message (output of [[seedRowToDmlMsg]], must contain
    * an `id` struct) into the keyed topic message (reference
    * seed_store.clj:50-55; FIXTURES.md A.4):
    *
    *  - key   = JSON array of the id fields flattened to
    *            [col1, val1, col2, val2, …] sorted by column name
    *  - value = JSON of the whole DML message
    *
    * Keys exist so log compaction keeps the latest message per row.
    */
  def dmlMsgToSeedMsg(df: DataFrame): DataFrame = {
    val idFields = df.schema("id").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.sorted
    val keyElems = idFields.flatMap(f =>
      Seq(lit(f), col(s"id.`$f`").cast("string")))
    df.select(
      to_json(array(keyElems.toIndexedSeq: _*)).as("key"),
      // explicit nulls: the value is the WHOLE DML message — a column
      // captured as NULL must be distinguishable from a column that was
      // never captured (Spark's to_json default silently omits nulls;
      // the reference serializes the full map)
      to_json(struct(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*),
        Map("ignoreNullFields" -> "false")).as("value"))
  }

  /** Log-compaction read: reduce a message log to the latest state per
    * key (reference initializer.clj:27-39 via Kafka compaction,
    * topic_store.clj:13-16). `max_by` over the ordering columns — one
    * shuffle on the key, partial aggregation map-side. */
  def lastStatePerKey(key: Seq[String], ordering: Seq[String])(df: DataFrame): DataFrame = {
    val payload = struct(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
    val ord = struct(ordering.map(c => col(s"`$c`")).toIndexedSeq: _*)
    df.groupBy(key.map(c => col(s"`$c`")): _*)
      .agg(max_by(payload, ord).as("__last"))
      .select("__last.*")
  }

  /** Reject rows in terminal states (reference initializer.clj:21-22:
    * `non-initializable-statuses` = #{active error}). A NULL status is
    * NOT terminal and must be kept — `!isin(...)` alone evaluates to
    * NULL for it and filter would silently discard the row, inverting
    * the reference's `(not (contains? terminal nil))` = true. */
  def dropTerminal(statusCol: String, terminal: Set[String])(df: DataFrame): DataFrame =
    df.filter(col(statusCol).isNull ||
      !col(statusCol).isin(terminal.toSeq.map(x => x: Any): _*))
}
