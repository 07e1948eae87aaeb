package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (upsert + optional delete) as ONE declarative
  * plan over immutable snapshots — the set-based equivalent of the
  * reference's per-row keyed UPDATE loops (sync-state flips in
  * postgres_db_tables.py / file_tracker.py are one-row-at-a-time MERGEs
  * in spirit), generalized to whole-table change application:
  *
  *   WHEN MATCHED [AND del] THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *
  * Output = surviving updates ∪ (base ⟕̸ updates) — the anti join keeps
  * every base row whose key carries no change. Exactly one shuffle of
  * the BASE on the merge key (the expensive side is touched once);
  * when the change set is small — the common CDC shape — Catalyst/AQE
  * broadcasts it and the base is never shuffled at all. Nothing here
  * is row-at-a-time and no driver collect occurs, so the same plan
  * holds at 100 TB: base scan + one join.
  *
  * Contract: `updates` has at most ONE row per key (enforce upstream
  * with e.g. LogStore.latest-style row_number dedup — duplicate keys
  * would fan out the anti join's semantics); both frames share the
  * base schema, `updates` plus an optional boolean delete column.
  */
object Merge {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val surviving = deleteCol match {
      case Some(d) => updates.filter(!coalesce(col(d), lit(false))).drop(d)
      case None    => updates
    }
    // anti-join on the FULL update key set (deleted keys must also
    // suppress their base rows — that is what makes the delete a delete)
    val updKeys = updates.select(keys.map(col): _*)
    base.join(updKeys, keys, "left_anti").unionByName(surviving)
  }

  /** Keyed snapshot diff — the reconciliation primitive (migration
    * verification, CDC audit, "what changed since yesterday"): one row
    * per key that was `added`, `removed`, or `changed` between two
    * same-schema snapshots; unchanged keys are dropped. Value
    * comparison is NULL-SAFE over all non-key columns, packed into one
    * struct per side so the full outer join carries two payload
    * columns, not 2×width. One shuffle per side on the key; at scale
    * this is the same plan as the upsert above read backwards.
    */
  def diff(before: DataFrame, after: DataFrame,
           keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshot schemas differ: ${before.columns.toSeq} vs ${after.columns.toSeq}")
    val cmp = before.columns.filterNot(keys.contains).sorted.toSeq
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+
        struct(cmp.map(col): _*).as(as): _*)
    packed(before, "_bv").join(packed(after, "_av"), keys, "full_outer")
      .withColumn("change_type",
        when(col("_bv").isNull, lit("added"))
          .when(col("_av").isNull, lit("removed"))
          .when(!(col("_bv") <=> col("_av")), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}
