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
}
