package graft.engine.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builds the seed-view shape from a plain table frame — the engine
  * analog of the reference's server-side seed view
  * (create_seed_view.sql:1-8, demonstrated in seed_store_test.clj:59-68):
  * `cdc.`-prefixed metadata/annotation columns prepended to the
  * table's data columns. Pure projection — at scale this is fused into
  * the parquet scan (constant columns + casts, no shuffle).
  */
object SeedViews {
  def forTable(
      df: DataFrame,
      table: String,
      pkCols: Seq[String],
      userId: String = "cdc-init"): DataFrame = {
    val meta =
      lit("insert").as("cdc.type") ::
        lit(table).as("cdc.table") ::
        lit(userId).as("cdc.info.user_id") ::
        pkCols.toList.map(c => col(s"`$c`").cast("string").as(s"cdc.id.$c"))
    val data = df.columns.toList.map(c => col(s"`$c`"))
    df.select(meta ++ data: _*)
  }
}
